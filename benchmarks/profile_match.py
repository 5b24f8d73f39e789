"""Sub-stage profiling of the keypoint match+RANSAC stage on real TPU.

The r3 keypoint headline splits 20x4K as detect 214 ms (device-true) /
match+RANSAC 119 ms / warp+stack 112 ms — detect was profiled and
optimised (profile_detect.py); this attributes the 119 ms:
Hamming-matmul 2-NN, ratio/sort/keep, and the adaptive-RANSAC
while_loop (hypothesis DLT solves vs scoring vs GN polish).
Run: PYTHONPATH=. python benchmarks/profile_match.py [--frames 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def sync(x):
    x = jax.tree.leaves(x)[0]
    jax.block_until_ready(x)
    _ = float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, reps=3):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    args = ap.parse_args()

    from benchmarks.bench_keypoint import make_textured_burst
    from libstacker_tpu.models import keypoint as kp
    from libstacker_tpu.ops import matcher, ransac

    print("backend:", jax.default_backend(), file=sys.stderr)
    n = args.frames
    frames = make_textured_burst(n, args.h, args.w)
    fj = jnp.asarray(frames)
    feats = kp.detect_features_chunked(fj)
    jax.block_until_ready(feats.xy)
    key = jax.random.PRNGKey(0)
    nl = n - 1  # lanes (frames 1..N-1 vs frame 0)

    @jax.jit
    def knn_only(feats):
        return jax.vmap(
            lambda d, v: matcher.knn_match2(
                feats.descriptors[0], d, feats.valid[0], v
            )
        )(feats.descriptors[1:], feats.valid[1:])

    t = timeit(knn_only, feats)
    print(f"knn 2-NN (Hamming matmul + top_k)  {t*1e3/nl:8.2f} ms/frame")

    @jax.jit
    def knn_filter(feats):
        knn = knn_only(feats)
        return jax.vmap(
            lambda k_: matcher.ratio_filter_sort_keep(k_, 0.9, 0.8)
        )(knn)

    t = timeit(knn_filter, feats)
    print(f"knn + ratio/sort/keep              {t*1e3/nl:8.2f} ms/frame")

    filt = knn_filter(feats)
    src = jax.vmap(lambda f: feats.xy[0][f.query_idx])(filt)
    dst = jax.vmap(lambda f, x: x[f.train_idx])(filt, feats.xy[1:])
    jax.block_until_ready(src)
    subkeys = jax.random.split(key, nl)

    @jax.jit
    def ransac_only(src, dst, keep, subkeys):
        return jax.vmap(
            lambda s, d, k_, sk: ransac.find_homography(
                s, d, k_, sk, method=8, reproj_threshold=5.0,
            )
        )(src, dst, keep, subkeys)

    t = timeit(ransac_only, src, dst, filt.keep, subkeys)
    print(f"RANSAC find_homography             {t*1e3/nl:8.2f} ms/frame")

    @jax.jit
    def ransac_norefine(src, dst, keep, subkeys):
        return jax.vmap(
            lambda s, d, k_, sk: ransac.find_homography(
                s, d, k_, sk, method=8, reproj_threshold=5.0,
                refine_iters=1,
            )
        )(src, dst, keep, subkeys)

    t = timeit(ransac_norefine, src, dst, filt.keep, subkeys)
    print(f"RANSAC (refine_iters=1)            {t*1e3/nl:8.2f} ms/frame")

    def full(feats, key):
        return kp._match_and_estimate(
            feats, key, method=8, ransac_reproj_threshold=5.0,
            match_keep_ratio=0.8, match_ratio=0.9,
        )

    t = timeit(full, feats, key)
    print(f"full _match_and_estimate           {t*1e3/nl:8.2f} ms/frame")


if __name__ == "__main__":
    main()
