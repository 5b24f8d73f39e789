"""Sub-stage profiling of the ORB detection pipeline on the real TPU.

Splits detect_features_chunked's cost (the r2 bench put it at 602 ms of
the 20-frame 4K keypoint budget) into: grayscale, pyramid resize, FAST
(corner+score+NMS), per-level top-k, patch extraction, Harris re-rank,
IC angles, per-level Gaussian blur, and rBRIEF — to aim the r3 kernel
work.  Run: PYTHONPATH=. python benchmarks/profile_detect.py [--frames 4]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def sync(x):
    x = jax.tree.leaves(x)[0]
    jax.block_until_ready(x)
    _ = float(jnp.asarray(x).reshape(-1)[0])  # force through the tunnel


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    args = ap.parse_args()

    from libstacker_tpu import constants
    from libstacker_tpu.ops import color, fast, filters, orb, orb_pallas, resize

    print("backend:", jax.default_backend(), file=sys.stderr)
    n, h, w = args.frames, args.h, args.w
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
    frames_j = jnp.asarray(frames)

    grey_fn = jax.jit(color.rgb_to_gray_u8)
    t = timeit(grey_fn, frames_j)
    print(f"grayscale          {t*1e3/n:8.2f} ms/frame")
    grey = grey_fn(frames_j)

    # pyramid sizes like orb.orb_detect_and_compute
    sizes = [(h, w)]
    for level in range(1, 8):
        s = 1.2 ** level
        sizes.append((int(round(h / s)), int(round(w / s))))

    @jax.jit
    def pyramid(g):
        outs = []
        cur = g
        for lvl in range(1, 8):
            cur = jax.vmap(
                lambda x: resize.resize(x, sizes[lvl], constants.INTER_LINEAR)
            )(cur)
            outs.append(jnp.sum(cur.astype(jnp.float32)))
        return jnp.stack(outs)

    t = timeit(pyramid, grey)
    print(f"pyramid resize x7  {t*1e3/n:8.2f} ms/frame")

    levels = [grey]
    cur = grey
    for lvl in range(1, 8):
        cur = jax.jit(
            jax.vmap(
                functools.partial(
                    resize.resize,
                    dsize=sizes[lvl],
                    interpolation=constants.INTER_LINEAR,
                )
            )
        )(cur)
        levels.append(cur)

    @jax.jit
    def fast_all(levels):
        outs = []
        for li in levels:
            mask, score = jax.vmap(fast.fast_detect)(li)
            outs.append(jnp.sum(score))
        return jnp.stack(outs)

    t = timeit(fast_all, levels)
    print(f"FAST+NMS (8 lvls)  {t*1e3/n:8.2f} ms/frame")

    @jax.jit
    def fast_l0(g):
        mask, score = jax.vmap(fast.fast_detect)(g)
        return jnp.sum(score)

    t = timeit(fast_l0, grey)
    print(f"FAST+NMS (lvl 0)   {t*1e3/n:8.2f} ms/frame")

    quotas = orb._features_per_level(500, 8, 1.2)

    @jax.jit
    def topk_all(levels):
        outs = []
        for li, q in zip(levels, quotas):
            mask, score = jax.vmap(fast.fast_detect)(li)
            cand = jax.vmap(
                functools.partial(fast.top_k_keypoints, k=2 * q)
            )(mask, score)
            outs.append(cand.ys.sum() + cand.xs.sum())
        return jnp.stack(outs)

    t = timeit(topk_all, levels)
    tk = t
    print(f"FAST+topk (8 lvls) {t*1e3/n:8.2f} ms/frame")

    # patch extraction + harris + angles + blur + rbrief on level 0
    q0 = quotas[0]
    mask, score = jax.jit(jax.vmap(fast.fast_detect))(grey)
    cand = jax.jit(
        jax.vmap(functools.partial(fast.top_k_keypoints, k=2 * q0))
    )(mask, score)

    @jax.jit
    def patches_fn(g, ys, xs):
        return jax.vmap(orb_pallas.extract_patches)(
            g.astype(jnp.float32), ys, xs
        )

    t = timeit(patches_fn, grey, cand.ys, cand.xs)
    print(f"patch extract lvl0 {t*1e3/n:8.2f} ms/frame   ({2*q0} patches)")
    patches = patches_fn(grey, cand.ys, cand.xs)

    @jax.jit
    def harris_fn(p):
        pr = orb_pallas.PATCH_RADIUS
        hsub = p[:, :, pr - 4 : pr + 5, pr - 4 : pr + 5]
        return jax.vmap(fast.harris_from_patches)(hsub)

    t = timeit(harris_fn, patches)
    print(f"harris lvl0        {t*1e3/n:8.2f} ms/frame")

    @jax.jit
    def angles_fn(p):
        return jax.vmap(orb._ic_angles_from_patches)(p)

    t = timeit(angles_fn, patches)
    print(f"ic angles lvl0     {t*1e3/n:8.2f} ms/frame")
    angles = angles_fn(patches)

    @jax.jit
    def blur_fn(g):
        return jax.vmap(
            lambda x: filters.gaussian_blur(
                x.astype(jnp.float32), 7, 2.0, border="reflect101"
            )
        )(g)

    t = timeit(blur_fn, grey)
    print(f"gauss blur lvl0    {t*1e3/n:8.2f} ms/frame")

    @jax.jit
    def rbrief_fn(p, a):
        return jax.vmap(orb._rbrief_from_patches)(p, a)

    t = timeit(rbrief_fn, patches[:, :q0], angles[:, :q0])
    print(f"rbrief lvl0        {t*1e3/n:8.2f} ms/frame   ({q0} kps)")

    # whole detect for reference
    from libstacker_tpu.models import keypoint as kp

    t = timeit(lambda f: kp.detect_features_chunked(f), frames_j)
    print(f"WHOLE detect       {t*1e3/n:8.2f} ms/frame")


if __name__ == "__main__":
    main()
