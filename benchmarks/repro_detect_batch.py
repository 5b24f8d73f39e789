"""Minimal repro for the batch-20 4K detection device fault (r3 VERDICT
weak #3): one vmapped FAST/ORB detect program over a [N, 2160, 3840]
burst.  N=10 (the production chunk budget) completes; N=20 reproducibly
faults the TPU runtime (same XLA bug family the one-hot rBRIEF hit at
batch 10 in r2 — the program is valid HLO; the backend miscompiles or
exhausts a hidden resource).  The chunk budget in
models/keypoint.py:detect_chunk_budget keeps production dispatches at
<= ~5.3 GB of transients, fenced by
tests/test_pipeline_keypoint.py::test_detect_chunk_budget_fence.

Usage (REAL TPU — this is a crash repro, do not run in CI):
    python benchmarks/repro_detect_batch.py --batch 10   # completes
    python benchmarks/repro_detect_batch.py --batch 20   # device fault
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    args = ap.parse_args()

    import jax.numpy as jnp

    from libstacker_tpu.models.keypoint import _grey_and_detect

    rng = np.random.default_rng(0)
    small = rng.integers(
        0, 256, (args.h // 8, args.w // 8), np.uint8
    )
    tex = small.repeat(8, axis=0).repeat(8, axis=1)
    frames = np.broadcast_to(
        tex[None, :, :, None], (args.batch, args.h, args.w, 3)
    ).copy()
    print(f"detecting batch {args.batch} at {args.h}x{args.w}...",
          flush=True)
    t0 = time.perf_counter()
    feats = _grey_and_detect(jnp.asarray(frames))
    n_kp = int(np.asarray(feats.valid).sum())
    print(f"OK: {n_kp} keypoints in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
