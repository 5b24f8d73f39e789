"""Benchmark harness: batched ECC-homography align+stack throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config mirrors BASELINE.md's north-star: a 100-frame 4K (2160x3840)
burst aligned with MotionType::Homography ECC and averaged.  The
vs_baseline denominator is the measured OpenCV-CPU throughput on this
machine (benchmarks/cpu_baseline.json, produced by
benchmarks/measure_cpu_baseline.py — the reference publishes no numbers,
SURVEY.md §6).
"""

import json
import os
import sys
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
H = int(os.environ.get("BENCH_H", "2160"))
W = int(os.environ.get("BENCH_W", "3840"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "4"))
NUM_ITERS = 50
EPS = 1e-4
GAUSS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_burst(n, h, w, seed=0):
    """Synthetic burst: smooth random base, small random homographies."""
    import cv2

    rng = np.random.default_rng(seed)
    pad = 32
    base = rng.integers(0, 256, size=(h + 2 * pad, w + 2 * pad), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 6.0)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    frames = np.empty((n, h, w, 3), np.uint8)
    ref = base[pad : pad + h, pad : pad + w]
    frames[0] = ref[..., None]
    for i in range(1, n):
        dx, dy = rng.uniform(-6, 6, 2)
        ang = rng.uniform(-0.6, 0.6)
        m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
        m[0, 2] += dx
        m[1, 2] += dy
        cur = cv2.warpAffine(
            base, m, (w + 2 * pad, h + 2 * pad),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        )[pad : pad + h, pad : pad + w]
        frames[i] = cur[..., None]
    return frames


def main():
    import jax
    import jax.numpy as jnp

    from libstacker_tpu.ops import color, ecc as ecc_ops
    from libstacker_tpu.ops.warp_batch import warp_frames_batch
    from libstacker_tpu.params import MotionType

    log(f"devices: {jax.devices()}")
    log(f"building synthetic burst {N_FRAMES}x{H}x{W}...")
    frames = make_burst(N_FRAMES, H, W)

    @jax.jit
    def prep(frames_u8):
        grey = color.rgb_to_gray_u8(frames_u8).astype(jnp.float32)
        return grey

    log("uploading burst to HBM...")
    t0 = time.perf_counter()
    frames_j = jnp.asarray(frames)
    frames_j.block_until_ready()
    log(f"upload took {time.perf_counter()-t0:.1f}s")

    def align_chunk(grey_chunk, ref_grey):
        # host-slabbed batched solve (bounded device programs)
        res = ecc_ops.find_transform_ecc_batched(
            grey_chunk, ref_grey,
            motion_type=MotionType.Homography,
            num_iters=NUM_ITERS, eps=EPS, gauss_filt_size=GAUSS,
        )
        return res.warp_matrix, res.ok

    @jax.jit
    def warp_accum(frames_chunk_u8, warps, oks, acc):
        f32 = color.u8_to_f32(frames_chunk_u8)
        warped = warp_frames_batch(f32, warps, perspective=True)
        valid = oks.astype(jnp.float32)[:, None, None, None]
        return acc + jnp.sum(warped * valid, axis=0)

    def run_once(frames_j):
        # one batched grey conversion for the whole burst (HBM-resident)
        grey_all = prep(frames_j)
        ref_grey = grey_all[0]
        acc = color.u8_to_f32(frames_j[0]).astype(jnp.float32)
        n_ok = jnp.int32(1)
        for s in range(1, N_FRAMES, CHUNK):
            e = min(s + CHUNK, N_FRAMES)
            grey_chunk = grey_all[s:e]
            warps, oks = align_chunk(grey_chunk, ref_grey)
            acc = warp_accum(frames_j[s:e], warps, oks, acc)
            n_ok = n_ok + jnp.sum(oks.astype(jnp.int32))
        stacked = acc / n_ok.astype(jnp.float32)
        return float(stacked[0, 0, 0]), stacked

    log("warmup/compile...")
    t0 = time.perf_counter()
    run_once(frames_j)
    log(f"warmup took {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    run_once(frames_j)
    dt = time.perf_counter() - t0
    fps = N_FRAMES / dt
    log(f"aligned+stacked {N_FRAMES} frames at {H}x{W} in {dt:.2f}s -> {fps:.2f} fps")

    baseline_fps = None
    bl_path = os.path.join(os.path.dirname(__file__), "benchmarks", "cpu_baseline.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            bl = json.load(f)
        key = f"ecc_homography_{H}x{W}_fps"
        baseline_fps = bl.get(key)
    vs = (fps / baseline_fps) if baseline_fps else None

    print(
        json.dumps(
            {
                "metric": f"ecc_homography_{N_FRAMES}f_{H}x{W}_align_stack",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
