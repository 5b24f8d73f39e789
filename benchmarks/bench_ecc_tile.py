"""Tile-shape sweep for the fused ECC iteration kernel (real TPU).

Times ``ecc_pallas.ecc_iteration_moments`` per lane-iteration at 4K for
a set of candidate tile shapes and checks moment parity against the
default (128, 128) tile (partition changes only the summation order, so
relative differences should sit at float32 reduction noise).

Usage: PYTHONPATH=. python benchmarks/bench_ecc_tile.py [--frames 8]
Tile temporaries scale with tile area (~46 MB at 128x128, limit 100 MB
raised per-shape below) — shapes beyond ~2x the default area are
excluded up front rather than risking a pathological Mosaic compile
(a hung compile can wedge the TPU tunnel; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from libstacker_tpu.ops import ecc_pallas
from libstacker_tpu.params import MotionType


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--mode",
                    choices=("forward", "forward_lite", "ic", "ic_hessian"),
                    default="forward",
                    help="which fused-iteration kernel to time "
                    "(forward_lite = with_hessian=False, the lazy "
                    "solver's steady-state sweep)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke run (forces the cpu "
                    "backend; timings are meaningless)")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    b, h, w = args.frames, args.h, args.w
    rng = np.random.default_rng(7)
    img = rng.random((h, w), np.float32)
    gx = rng.standard_normal((h, w)).astype(np.float32) * 0.1
    gy = rng.standard_normal((h, w)).astype(np.float32) * 0.1
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    srcs = np.zeros((3, hp, wp), np.float32)
    srcs[0, :h, :w], srcs[1, :h, :w], srcs[2, :h, :w] = img, gx, gy
    templates = np.zeros((b, hp, wp), np.float32)
    templates[:, :h, :w] = rng.random((b, h, w), np.float32)
    m3 = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    m3[:, 0, 2] = rng.uniform(-3, 3, b)  # sub-band translations
    m3[:, 1, 2] = rng.uniform(-3, 3, b)

    srcs_d = jnp.asarray(srcs)
    # forward streams exact [B,h,w] template tiles; IC DMAs haloed
    # windows from the (8,128)-pre-padded [B,hp,wp] array
    tmpl_d = (
        jnp.asarray(templates[:, :h, :w])
        if args.mode in ("forward", "forward_lite")
        else jnp.asarray(templates)
    )
    m3_d = jnp.asarray(m3)
    log(f"uploaded {b}x{h}x{w} (k={args.k})")

    shapes = [(128, 128), (64, 256), (64, 384), (64, 512), (128, 256)]
    ref_mom = None
    results = {}
    for tile in shapes:
        def run():
            if args.mode in ("forward", "forward_lite"):
                return ecc_pallas.ecc_iteration_moments(
                    srcs_d, tmpl_d, m3_d,
                    motion_type=MotionType.Homography,
                    k=args.k, tile=tile, true_hw=(h, w),
                    with_hessian=(args.mode == "forward"),
                    interpret=args.interpret,
                )
            return ecc_pallas.ecc_ic_iteration_moments(
                srcs_d[0], tmpl_d, m3_d,
                motion_type=MotionType.Homography,
                k=args.k, tile=tile, true_hw=(h, w),
                with_hessian=(args.mode == "ic_hessian"),
                interpret=args.interpret,
            )

        try:
            t0 = time.perf_counter()
            mom = run()
            mom_np = np.asarray(mom)
            log(f"tile {tile}: compile+first {time.perf_counter()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 - report and move on
            log(f"tile {tile}: FAILED {type(e).__name__}: {e}")
            continue
        if ref_mom is None:
            ref_mom = mom_np
            rel = 0.0
        else:
            denom = np.maximum(np.abs(ref_mom), 1e-6)
            rel = float(np.max(np.abs(mom_np - ref_mom) / denom))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            mom = run()
        np.asarray(mom)  # force completion over the tunnel
        dt = time.perf_counter() - t0
        per_lane_ms = dt / (args.iters * b) * 1e3
        results[tile] = per_lane_ms
        log(f"tile {tile}: {per_lane_ms:.2f} ms/lane-iter  rel_err {rel:.2e}")

    best = min(results, key=results.get) if results else None
    print(
        {
            "results_ms_per_lane_iter": {str(k): round(v, 3) for k, v in results.items()},
            "best": str(best),
        }
    )


if __name__ == "__main__":
    main()
