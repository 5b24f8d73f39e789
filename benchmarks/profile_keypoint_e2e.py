"""Marginal-cost attribution of the keypoint headline (20x4K).

The bench's per-stage timers bound each stage with a host sync, so the
three stage numbers double-count tunnel round-trips and sum to ~2x the
real end-to-end time.  This measures warm wall time for nested PREFIXES
of the pipeline — detect; +match; +speculative k=1 warp; full production
dispatch (incl. the pallas_pick_k fetch) — whose DIFFERENCES are the
true marginal stage costs.

Run: PYTHONPATH=. python benchmarks/profile_keypoint_e2e.py [--frames 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, reps=3):
    fn()  # warm (compile)
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    # force: fetch one scalar (block_until_ready can no-op over the tunnel)
    leaf = [x for x in jax.tree.leaves(out) if hasattr(x, "reshape")][0]
    _ = np.asarray(jnp.reshape(leaf, (-1,))[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    args = ap.parse_args()

    from benchmarks.bench_keypoint import make_textured_burst
    from libstacker_tpu.models import keypoint as kp
    from libstacker_tpu.ops import warp_batch

    print("backend:", jax.default_backend(), file=sys.stderr)
    n = args.frames
    frames = make_textured_burst(n, args.h, args.w)
    fj = jnp.asarray(frames)
    jax.block_until_ready(fj)
    key = jax.random.PRNGKey(0)
    h, w = args.h, args.w

    def detect():
        return kp.detect_features_chunked(fj)

    def match():
        feats = kp.detect_features_chunked(fj)
        return kp._match_and_estimate(
            feats, key, method=8, ransac_reproj_threshold=5.0,
            match_keep_ratio=0.8, match_ratio=0.9,
        )

    def spec_warp():
        feats = kp.detect_features_chunked(fj)
        hs, oks, mc, ic = kp._match_and_estimate(
            feats, key, method=8, ransac_reproj_threshold=5.0,
            match_keep_ratio=0.8, match_ratio=0.9,
        )
        return kp._warp_and_accumulate(
            fj, hs, oks, border_mode=0, border_value=(0.0,) * 4,
            allow_pallas=True, pallas_k=1,
        )

    def full():
        feats = kp.detect_features_chunked(fj)
        hs, oks, mc, ic = kp._match_and_estimate(
            feats, key, method=8, ransac_reproj_threshold=5.0,
            match_keep_ratio=0.8, match_ratio=0.9,
        )
        spec = kp._warp_and_accumulate(
            fj, hs, oks, border_mode=0, border_value=(0.0,) * 4,
            allow_pallas=True, pallas_k=1,
        )
        warp_k = warp_batch.pallas_pick_k(
            np.asarray(jax.device_get(hs), np.float64), h, w
        )
        assert warp_k == 1, warp_k
        kept = 1 + jnp.sum(oks.astype(jnp.int32))
        return spec / kept.astype(jnp.float32)

    t_detect = timeit(detect)
    print(f"detect only                     {t_detect*1e3:8.1f} ms")
    t_match = timeit(match)
    print(f"detect+match                    {t_match*1e3:8.1f} ms"
          f"   (match marginal {1e3*(t_match-t_detect):6.1f})")
    t_spec = timeit(spec_warp)
    print(f"detect+match+warp(k=1)          {t_spec*1e3:8.1f} ms"
          f"   (warp marginal {1e3*(t_spec-t_match):6.1f})")
    t_full = timeit(full)
    print(f"full (incl pick_k fetch)        {t_full*1e3:8.1f} ms"
          f"   (dispatch marginal {1e3*(t_full-t_spec):6.1f})")
    print(f"=> {n / t_full:.2f} fps")


if __name__ == "__main__":
    main()
