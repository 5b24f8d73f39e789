"""Secondary benchmark: keypoint_match (ORB+RANSAC) throughput at 4K,
TPU vs the OpenCV-CPU oracle pipeline (BASELINE.md config 1 scaled up).

Usage: python benchmarks/bench_keypoint.py [--frames 20] [--cpu]
Prints one JSON line per implementation run.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_textured_burst(n, h, w, seed=0):
    """Burst with real corners (block texture) + small rotations/shifts."""
    import cv2

    rng = np.random.default_rng(seed)
    pad = 32
    small = rng.integers(0, 256, size=((h + 2 * pad) // 8, (w + 2 * pad) // 8),
                         dtype=np.uint8)
    base = cv2.resize(small, (w + 2 * pad, h + 2 * pad),
                      interpolation=cv2.INTER_NEAREST)
    base = cv2.GaussianBlur(base, (3, 3), 0.8)
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        if i == 0:
            cur = base
        else:
            ang = rng.uniform(-0.6, 0.6)
            dx, dy = rng.uniform(-6, 6, 2)
            m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
            m[0, 2] += dx
            m[1, 2] += dy
            cur = cv2.warpAffine(
                base, m, (w + 2 * pad, h + 2 * pad),
                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            )
        frames[i] = cur[pad : pad + h, pad : pad + w, None]
    return frames


def run_cpu(frames):
    """The reference pipeline recomputed with cv2 (src/lib.rs:146-353)."""
    import cv2

    n, h, w = frames.shape[:3]
    greys = [cv2.cvtColor(f[..., ::-1].copy(), cv2.COLOR_BGR2GRAY) for f in frames]
    f32s = [f.astype(np.float32) / 255.0 for f in frames]
    orb = cv2.ORB_create()
    t0 = time.perf_counter()
    kp0, des0 = orb.detectAndCompute(greys[0], None)
    acc = f32s[0].copy()
    kept = 1
    for i in range(1, n):
        kp, des = orb.detectAndCompute(greys[i], None)
        bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
        knn = bf.knnMatch(des0, des, k=2)
        good = [m[0] for m in knn if len(m) == 2 and m[0].distance < 0.9 * m[1].distance]
        good.sort(key=lambda m: m.distance)
        good = good[: int(round(len(good) * 0.8))]
        if len(good) < 5:
            continue
        src = np.float32([kp[m.trainIdx].pt for m in good]).reshape(-1, 1, 2)
        dst = np.float32([kp0[m.queryIdx].pt for m in good]).reshape(-1, 1, 2)
        hmat, _ = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
        if hmat is None or abs(np.linalg.det(hmat)) < 1e-6:
            continue
        acc += cv2.warpPerspective(f32s[i], hmat, (w, h))
        kept += 1
    stacked = acc / kept
    dt = time.perf_counter() - t0
    return n / dt, kept


def run_tpu(frames):
    """Times the device pipeline with the result left in HBM (one scalar
    fetched to synchronise) — the dev-tunnel D2H link is ~1 MB/s and
    would otherwise dominate; production hosts fetch over PCIe."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libstacker_tpu.models import keypoint as kp
    from libstacker_tpu.ops import warp_batch

    fj = jnp.asarray(frames)
    key = jax.random.PRNGKey(0)
    h, w = frames.shape[1:3]

    def once():
        feats = kp.detect_features_chunked(fj)
        hs, oks, mc, ic = kp._match_and_estimate(
            feats, key, method=8, ransac_reproj_threshold=5.0,
            match_keep_ratio=0.8, match_ratio=0.9,
        )
        # production dispatch, speculative like keypoint_match_arrays:
        # the common-case k=1 warp is dispatched BEFORE the matrices
        # cross the tunnel for the domain check, hiding the round-trip
        spec = kp._warp_and_accumulate(
            fj, hs, oks, border_mode=0, border_value=(0.0,) * 4,
            allow_pallas=True, pallas_k=1,
        )
        warp_k = warp_batch.pallas_pick_k(
            np.asarray(jax.device_get(hs), np.float64), h, w
        )
        if warp_k == 1:
            acc = spec
            kept = 1 + jnp.sum(oks.astype(jnp.int32))
            stacked = acc / kept.astype(jnp.float32)
            return float(stacked[0, 0, 0]), int(kept)
        acc = kp._warp_and_accumulate(
            fj, hs, oks, border_mode=0, border_value=(0.0,) * 4,
            allow_pallas=warp_k is not None, pallas_k=warp_k or 7,
        )
        kept = 1 + jnp.sum(oks.astype(jnp.int32))
        stacked = acc / kept.astype(jnp.float32)
        return float(stacked[0, 0, 0]), int(kept)

    once()
    t0 = time.perf_counter()
    _, kept = once()
    dt = time.perf_counter() - t0

    # attributable per-stage split (separate pass — the stage syncs
    # would perturb the headline)
    stage = {}
    t0s = time.perf_counter()
    feats = kp.detect_features_chunked(fj)
    jax.block_until_ready(feats.xy)
    _ = float(feats.xy[0, 0, 0])
    stage["detect_s"] = round(time.perf_counter() - t0s, 3)
    t0s = time.perf_counter()
    hs, oks, mc, ic = kp._match_and_estimate(
        feats, key, method=8, ransac_reproj_threshold=5.0,
        match_keep_ratio=0.8, match_ratio=0.9,
    )
    hs_np = np.asarray(jax.device_get(hs), np.float64)
    stage["match_ransac_s"] = round(time.perf_counter() - t0s, 3)
    t0s = time.perf_counter()
    warp_k = warp_batch.pallas_pick_k(hs_np, h, w)
    acc = kp._warp_and_accumulate(
        fj, hs, oks, border_mode=0, border_value=(0.0,) * 4,
        allow_pallas=warp_k is not None, pallas_k=warp_k or 7,
    )
    _ = float(acc[0, 0, 0])
    stage["warp_stack_s"] = round(time.perf_counter() - t0s, 3)
    stage["warp_k"] = warp_k
    print(f"stages: {stage}", file=sys.stderr)
    return frames.shape[0] / dt, kept, stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    frames = make_textured_burst(args.frames, args.h, args.w)
    stage = None
    if args.cpu:
        fps, kept = run_cpu(frames)
        impl = "opencv_cpu"
    else:
        fps, kept, stage = run_tpu(frames)
        impl = "libstacker_tpu"
    out = {
        "metric": f"keypoint_{args.frames}f_{args.h}x{args.w}_align_stack",
        "impl": impl,
        "value": round(fps, 3),
        "unit": "frames/sec",
        "frames_kept": int(kept),
    }
    if stage is not None:
        out["stages"] = stage
    print(json.dumps(out))


if __name__ == "__main__":
    main()
