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


@pytest.mark.parametrize("outlier_frac", [0.5, 0.75])
def test_homography_low_inlier_ratio(rng, outlier_frac):
    """Adaptive termination (OpenCV RANSACUpdateNumIters semantics): at
    25-50% inliers the loop must escalate past the first slabs and still
    recover the model, like cv2.findHomography with maxIters=2000."""
    src, dst, h_true, out_idx = _make_correspondences(
        rng, n=240, outlier_frac=outlier_frac
    )
    n = src.shape[0]
    true_inl = np.ones(n, bool)
    true_inl[out_idx] = False
    res = ransac.find_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool),
        jax.random.PRNGKey(3), method=constants.RANSAC,
        reproj_threshold=3.0,
    )
    assert bool(res.ok)
    err = _max_reproj_err(np.asarray(res.h, np.float64), src, dst, true_inl)
    h_cv, _ = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    err_cv = _max_reproj_err(h_cv, src, dst, true_inl)
    assert err < max(3.0 * err_cv, 3.0)
    inl = np.asarray(res.inliers)
    assert inl[true_inl].mean() > 0.9
    assert inl[~true_inl].mean() < 0.1


def test_homography_degenerate_samples_rejected(rng):
    """A correspondence set dominated by one line must not produce a
    wild H from collinear 4-point samples: with only 8 off-line points
    carrying the model, the checkSubset-style rejection keeps the
    estimate sane."""
    n_line = 120
    t = rng.uniform(0, 1000, n_line)
    line = np.stack([t, 0.5 * t + 20.0], axis=1)  # collinear cloud
    good = rng.uniform(0, 1000, (24, 2))
    src = np.concatenate([line, good]).astype(np.float32)
    h_true = np.array(
        [[1.01, 0.02, 4.0], [-0.01, 0.98, 2.0], [0, 0, 1.0]], np.float64
    )
    p = np.concatenate([src, np.ones((src.shape[0], 1), np.float32)], 1)
    dst = (p @ h_true.T)
    dst = (dst[:, :2] / dst[:, 2:3]).astype(np.float32)
    res = ransac.find_homography(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(src.shape[0], bool), jax.random.PRNGKey(4),
    )
    assert bool(res.ok)
    err = _max_reproj_err(
        np.asarray(res.h, np.float64), src, dst, np.ones(src.shape[0], bool)
    )
    assert err < 1.0  # noiseless correspondences -> near-exact recovery


def test_homography_too_few_points(rng):
    src = rng.uniform(0, 100, (8, 2)).astype(np.float32)
    valid = np.zeros(8, bool)
    valid[:3] = True
    res = ransac.find_homography(
        jnp.asarray(src), jnp.asarray(src), jnp.asarray(valid),
        jax.random.PRNGKey(2),
    )
    assert not bool(res.ok)


def test_find_homography_method0_least_squares():
    """method=0: one least-squares fit over ALL points (no robust
    loop) — reachable in the reference because `method` is a raw i32
    handed to findHomography (src/lib.rs:267-276).  Compare against
    cv2.findHomography(..., 0) on clean correspondences."""
    import cv2

    rng = np.random.default_rng(49)  # local (conftest rng note)
    h_true = np.array(
        [[1.01, 0.02, 4.0], [-0.015, 0.99, -2.5], [1e-5, -2e-5, 1.0]],
        np.float64,
    )
    n = 60
    src = rng.uniform(0, 500, (n, 2))
    ones = np.ones((n, 1))
    p = (np.hstack([src, ones]) @ h_true.T)
    dst = p[:, :2] / p[:, 2:]
    dst += rng.normal(0, 0.3, dst.shape)  # small noise, NO outliers

    want, _ = cv2.findHomography(
        src.reshape(-1, 1, 2).astype(np.float32),
        dst.reshape(-1, 1, 2).astype(np.float32), 0,
    )
    m = 64  # padded capacity
    srcp = np.zeros((m, 2), np.float32); srcp[:n] = src
    dstp = np.zeros((m, 2), np.float32); dstp[:n] = dst
    validp = np.zeros(m, bool); validp[:n] = True
    res = ransac.find_homography(
        jnp.asarray(srcp), jnp.asarray(dstp), jnp.asarray(validp),
        jax.random.PRNGKey(0), method=0,
    )
    assert bool(res.ok)
    got = np.asarray(res.h)
    np.testing.assert_allclose(got, want / want[2, 2], atol=5e-3)
    # the model must actually fit: median reprojection error ~ noise
    p2 = np.hstack([src, ones]) @ got.astype(np.float64).T
    proj = p2[:, :2] / p2[:, 2:]
    assert np.median(np.linalg.norm(proj - dst, axis=1)) < 1.0
