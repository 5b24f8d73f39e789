"""Dev tool: compare our batched ECC against cv2.findTransformECC
iteration-by-iteration (by sweeping max_count) on synthetic frames."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cv2
import numpy as np
import jax.numpy as jnp

from libstacker_tpu.ops import ecc as ecc_ops
from libstacker_tpu.params import MotionType


def make_pair(h=120, w=160, kind="translation", seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h * 2, w * 2)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 4.0) * 255.0
    ref = base[h // 2 : h // 2 + h, w // 2 : w // 2 + w].copy()
    if kind == "translation":
        m = np.array([[1, 0, 2.7], [0, 1, -1.3]], np.float32)
    elif kind == "euclidean":
        m = cv2.getRotationMatrix2D((w / 2, h / 2), 1.5, 1.0).astype(np.float32)
        m[0, 2] += 1.2
    elif kind == "affine":
        m = np.array([[1.01, 0.012, 1.5], [-0.008, 0.995, -0.8]], np.float32)
    else:  # homography
        m = np.array(
            [[1.01, 0.01, 1.5], [-0.008, 0.998, -0.9], [2e-5, -1e-5, 1.0]],
            np.float32,
        )
    if m.shape[0] == 2:
        cur = cv2.warpAffine(
            base, m, (w * 2, h * 2), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
        )
    else:
        cur = cv2.warpPerspective(
            base, m, (w * 2, h * 2), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
        )
    cur = cur[h // 2 : h // 2 + h, w // 2 : w // 2 + w].copy()
    return ref.astype(np.uint8), cur.astype(np.uint8)


def run(kind, motion, iters_list=(1, 2, 5, 10, 50)):
    ref, cur = make_pair(kind=kind)
    cv_motion = {
        MotionType.Translation: cv2.MOTION_TRANSLATION,
        MotionType.Euclidean: cv2.MOTION_EUCLIDEAN,
        MotionType.Affine: cv2.MOTION_AFFINE,
        MotionType.Homography: cv2.MOTION_HOMOGRAPHY,
    }[motion]
    print(f"=== {kind} ===")
    for it in iters_list:
        crit = (cv2.TERM_CRITERIA_COUNT, it, 0.0)
        wm = (
            np.eye(3, dtype=np.float32)
            if motion == MotionType.Homography
            else np.eye(2, 3, dtype=np.float32)
        )
        try:
            rho_cv, m_cv = cv2.findTransformECC(
                cur, ref, wm, cv_motion, crit, None, 5
            )
        except cv2.error as e:
            print(f"iters={it}: cv2 error {e}")
            continue
        res = ecc_ops.find_transform_ecc(
            jnp.asarray(cur),
            jnp.asarray(ref),
            motion_type=motion,
            num_iters=it,
            eps=-1.0,
            gauss_filt_size=5,
        )
        m_us = np.asarray(res.warp_matrix)
        diff = np.abs(m_us - m_cv).max()
        print(
            f"iters={it}: rho cv={rho_cv:.6f} us={float(res.rho):.6f} "
            f"max|dM|={diff:.2e} ok={bool(res.ok)} n_it={int(res.num_iters)}"
        )
        if it == iters_list[-1]:
            print("cv:\n", m_cv, "\nus:\n", m_us)


if __name__ == "__main__":
    run("translation", MotionType.Translation)
    run("euclidean", MotionType.Euclidean)
    run("affine", MotionType.Affine)
    run("homography", MotionType.Homography)
