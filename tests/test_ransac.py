"""RANSAC/LMEDS homography quality vs cv2.findHomography (SURVEY.md N3).

RANSAC is randomised in both implementations, so parity is statistical
(SURVEY.md §7 phase 5): we assert reprojection accuracy against the
ground-truth homography and sane inlier recovery, not bitwise equality.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu import constants
from libstacker_tpu.ops import ransac


def _make_correspondences(rng, n=200, outlier_frac=0.3, noise=0.5):
    h_true = np.array(
        [[1.02, 0.01, 5.0], [-0.015, 0.99, -3.0], [1e-5, -2e-5, 1.0]],
        dtype=np.float64,
    )
    src = rng.uniform(0, 1000, size=(n, 2))
    ones = np.ones((n, 1))
    p = (np.concatenate([src, ones], 1) @ h_true.T)
    dst = p[:, :2] / p[:, 2:3]
    dst += rng.normal(0, noise, dst.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] += rng.uniform(30, 200, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return src.astype(np.float32), dst.astype(np.float32), h_true, out_idx


def _max_reproj_err(h, src, dst, inlier_mask):
    p = cv2.perspectiveTransform(src.reshape(-1, 1, 2).astype(np.float64), h)
    err = np.linalg.norm(p.reshape(-1, 2) - dst, axis=1)
    return err[inlier_mask].max() if inlier_mask.any() else np.inf


@pytest.mark.parametrize("method", [constants.RANSAC, constants.LMEDS])
def test_homography_quality(rng, method):
    src, dst, h_true, out_idx = _make_correspondences(rng)
    n = src.shape[0]
    true_inl = np.ones(n, bool)
    true_inl[out_idx] = False

    res = ransac.find_homography(
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.ones(n, bool),
        jax.random.PRNGKey(0),
        method=method,
        reproj_threshold=3.0,
    )
    assert bool(res.ok)
    h = np.asarray(res.h, dtype=np.float64)
    # our H must fit the true inliers about as well as cv2's
    err_us = _max_reproj_err(h, src, dst, true_inl)
    h_cv, mask_cv = cv2.findHomography(src, dst, method, 3.0)
    err_cv = _max_reproj_err(h_cv, src, dst, true_inl)
    assert err_us < max(3.0 * err_cv, 3.0)
    # inlier recovery: most true inliers found, few outliers admitted
    inl = np.asarray(res.inliers)
    assert inl[true_inl].mean() > 0.9
    assert inl[~true_inl].mean() < 0.1


def test_homography_padded_invalid_points(rng):
    src, dst, h_true, out_idx = _make_correspondences(rng, n=100)
    pad = 56
    src_p = np.concatenate([src, np.full((pad, 2), 777.0, np.float32)])
    dst_p = np.concatenate([dst, np.full((pad, 2), -55.0, np.float32)])
    valid = np.concatenate([np.ones(100, bool), np.zeros(pad, bool)])
    res = ransac.find_homography(
        jnp.asarray(src_p),
        jnp.asarray(dst_p),
        jnp.asarray(valid),
        jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    assert not np.asarray(res.inliers)[100:].any()
    true_inl = np.ones(100, bool)
    true_inl[out_idx] = False
    err = _max_reproj_err(np.asarray(res.h, np.float64), src, dst, true_inl)
    assert err < 5.0


def test_homography_too_few_points(rng):
    src = rng.uniform(0, 100, (8, 2)).astype(np.float32)
    valid = np.zeros(8, bool)
    valid[:3] = True
    res = ransac.find_homography(
        jnp.asarray(src), jnp.asarray(src), jnp.asarray(valid),
        jax.random.PRNGKey(2),
    )
    assert not bool(res.ok)
