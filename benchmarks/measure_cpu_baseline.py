"""Measure the OpenCV-CPU baseline for BASELINE.md's configs.

The reference publishes no numbers (SURVEY.md §6), so the baseline is
multithreaded opencv-python on this machine, mirroring the reference
pipeline exactly (per-frame findTransformECC / ORB+BFMatcher+RANSAC +
warp + accumulate, threads across frames like Rayon).  Writes
benchmarks/cpu_baseline.json, which bench.py uses as the vs_baseline
denominator.

Usage: python benchmarks/measure_cpu_baseline.py [--frames 8] [--h 2160 --w 3840]
"""

import argparse
import concurrent.futures
import json
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import make_burst  # noqa: E402  (same synthetic burst generator)


def ecc_align_one(grey_i, grey0, f32_i, h, w):
    wm = np.eye(3, dtype=np.float32)
    crit = (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 50, 1e-4)
    cv2.findTransformECC(grey_i, grey0, wm, cv2.MOTION_HOMOGRAPHY, crit, None, 5)
    return cv2.warpPerspective(f32_i, wm, (w, h))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    args = ap.parse_args()

    n, h, w = args.frames, args.h, args.w
    print(f"burst {n}x{h}x{w}, {args.threads} threads", file=sys.stderr)
    frames = make_burst(n, h, w)
    greys = [
        cv2.cvtColor(f[..., ::-1].copy(), cv2.COLOR_BGR2GRAY) for f in frames
    ]
    f32s = [f.astype(np.float32) / 255.0 for f in frames]

    t0 = time.perf_counter()
    acc = f32s[0].copy()
    with concurrent.futures.ThreadPoolExecutor(args.threads) as pool:
        futs = [
            pool.submit(ecc_align_one, greys[i], greys[0], f32s[i], h, w)
            for i in range(1, n)
        ]
        for f in futs:
            acc += f.result()
    stacked = acc / n
    dt = time.perf_counter() - t0
    fps = n / dt
    print(
        f"CPU ECC homography: {n} frames in {dt:.1f}s -> {fps:.4f} fps",
        file=sys.stderr,
    )

    out_path = os.path.join(os.path.dirname(__file__), "cpu_baseline.json")
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data[f"ecc_homography_{h}x{w}_fps"] = round(fps, 4)
    data[f"ecc_homography_{h}x{w}_meta"] = {
        "frames_measured": n,
        "threads": args.threads,
        "iters": 50,
        "machine_cpus": os.cpu_count(),
    }
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
