"""Phase-correlation ECC warm start (ops/phasecorr.py).

A capability beyond the reference (libstacker always inits
findTransformECC at the identity, src/lib.rs:769-777): the batched FFT
translation estimate must (a) recover known shifts to sub-pixel
accuracy, (b) cut ECC iterations without changing the converged warp,
and (c) degrade to the identity init on uncorrelated content.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import ecc as ecc_ops, phasecorr
from libstacker_tpu.params import EccMatchParameters, MotionType


def _shifted_pair(tx, ty, h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    pad = 32
    base = rng.integers(0, 256, size=(h + 2 * pad, w + 2 * pad))
    base = cv2.GaussianBlur(base.astype(np.float32), (0, 0), 4.0)
    ref = base[pad : pad + h, pad : pad + w]
    m = np.float32([[1, 0, tx], [0, 1, ty]])
    cur = cv2.warpAffine(
        base, m, (w + 2 * pad, h + 2 * pad),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
    )[pad : pad + h, pad : pad + w]
    return ref, cur


def test_recovers_known_shifts():
    shifts = [(5.0, -3.0), (-7.25, 2.5), (0.0, 0.0), (11.0, 9.75)]
    ref, _ = _shifted_pair(0, 0)
    curs = np.stack([_shifted_pair(tx, ty)[1] for tx, ty in shifts])
    t, resp = phasecorr.phase_correlate_batched(
        jnp.asarray(curs), jnp.asarray(ref)
    )
    t = np.asarray(t)
    assert np.asarray(resp).min() > 0.3
    for i, (tx, ty) in enumerate(shifts):
        assert abs(t[i, 0] - tx) < 0.25, (i, t[i], (tx, ty))
        assert abs(t[i, 1] - ty) < 0.25, (i, t[i], (tx, ty))


def test_downscaled_recovery():
    """Pooled-grid correlation (the 4K memory guard) still recovers the
    full-res shift to ~downscale/2 px."""
    ref, cur = _shifted_pair(9.0, -6.0, h=320, w=384, seed=5)
    t, resp = phasecorr.phase_correlate_batched(
        jnp.asarray(cur)[None], jnp.asarray(ref), downscale=2
    )
    t = np.asarray(t)[0]
    assert float(np.asarray(resp)[0]) > 0.2
    assert abs(t[0] - 9.0) < 1.0 and abs(t[1] + 6.0) < 1.0, t
    # auto factor keeps small grids at 1 and caps 4K at 4
    assert phasecorr._auto_downscale(320, 384) == 1
    assert phasecorr._auto_downscale(2160, 3840) == 4


def test_warm_start_same_warp_fewer_iters():
    ref, cur = _shifted_pair(6.0, -4.0, seed=3)
    tj, rj = jnp.asarray(cur)[None], jnp.asarray(ref)
    cold = ecc_ops.find_transform_ecc_batched(
        tj, rj, motion_type=MotionType.Translation,
        num_iters=100, eps=1e-5,
    )
    init = phasecorr.phase_init_warps(tj, rj, MotionType.Translation)
    warm = ecc_ops.find_transform_ecc_batched(
        tj, rj, motion_type=MotionType.Translation,
        num_iters=100, eps=1e-5, warp_init=init,
    )
    assert np.asarray(cold.ok).all() and np.asarray(warm.ok).all()
    np.testing.assert_allclose(
        np.asarray(warm.warp_matrix), np.asarray(cold.warp_matrix),
        atol=0.05,
    )
    assert int(warm.num_iters[0]) < int(cold.num_iters[0])


def test_low_response_keeps_identity():
    rng = np.random.default_rng(9)
    a = cv2.GaussianBlur(rng.random((160, 200)).astype(np.float32), (0, 0), 3)
    b = cv2.GaussianBlur(rng.random((160, 200)).astype(np.float32), (0, 0), 3)
    init = np.asarray(
        phasecorr.phase_init_warps(
            jnp.asarray(a)[None], jnp.asarray(b), MotionType.Affine
        )
    )
    np.testing.assert_array_equal(init[0], np.eye(3, dtype=np.float32)[:2])


def test_init_shapes_all_motion_types():
    ref, cur = _shifted_pair(2.0, 1.0)
    tj, rj = jnp.asarray(cur)[None], jnp.asarray(ref)
    for mt, rows in [
        (MotionType.Translation, 2), (MotionType.Euclidean, 2),
        (MotionType.Affine, 2), (MotionType.Homography, 3),
    ]:
        init = np.asarray(phasecorr.phase_init_warps(tj, rj, mt))
        assert init.shape == (1, rows, 3), (mt, init.shape)
        assert abs(init[0, 0, 2] - 2.0) < 0.25
        assert abs(init[0, 1, 2] - 1.0) < 0.25


def _rotated_pair(ang_deg, scale, dx, dy, h=256, w=320, seed=3):
    """(ref, template, ground-truth W[:2]) with
    template(x) = ref(W x) exactly (cv2 WARP_INVERSE_MAP about the
    crop centre)."""
    rng = np.random.default_rng(seed)
    base = cv2.GaussianBlur(
        (rng.random((h * 2, w * 2)) * 255).astype(np.float32), (0, 0), 2.0
    )
    ref = base[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
    m = cv2.getRotationMatrix2D((w, h), ang_deg, scale)
    m[0, 2] += dx
    m[1, 2] += dy
    m3 = np.vstack([m, [0, 0, 1]]).astype(np.float32)
    cur = cv2.warpPerspective(
        base, m3, (w * 2, h * 2),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
    )
    tm = cur[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
    off = np.array([[1, 0, w // 2], [0, 1, h // 2], [0, 0, 1]], np.float32)
    mc = np.linalg.inv(off) @ m3 @ off
    return ref, tm, mc[:2]


def test_rotscale_recovers_rotation_and_scale():
    """Log-polar magnitude correlation (Reddy-Chatterji) recovers known
    rotations and uniform scales — including the Fourier-reciprocity
    direction of the scale axis."""
    cases = [(2.0, 1.0), (-2.5, 1.0), (1.0, 1.04), (0.0, 0.96)]
    ref = None
    tms, truths = [], []
    for ang, sc in cases:
        ref, tm, w_true = _rotated_pair(ang, sc, 3.0, -2.0)
        tms.append(tm)
        truths.append(w_true)
    theta, scale, resp = phasecorr.phase_correlate_rotscale(
        jnp.asarray(np.stack(tms)), jnp.asarray(ref)
    )
    for i, tr in enumerate(truths):
        th_true = np.arctan2(tr[1, 0], tr[0, 0])
        sc_true = float(np.sqrt(np.linalg.det(tr[:2, :2])))
        assert float(resp[i]) > 0.2, (i, float(resp[i]))
        assert abs(float(theta[i]) - th_true) < 0.005, (i, theta[i], th_true)
        assert abs(float(scale[i]) - sc_true) < 0.01, (i, scale[i], sc_true)


def test_rotation_init_composes_full_warp():
    """phase_init_warps(rotation=True) lands within ~0.5 px of the
    ground-truth warp: rotation/scale about the centre composed with
    the translation measured on the de-rotated template."""
    cases = [(2.0, 1.0), (-2.5, 1.0), (1.0, 1.04)]
    tms, truths = [], []
    ref = None
    for ang, sc in cases:
        ref, tm, w_true = _rotated_pair(ang, sc, 3.0, -2.0)
        tms.append(tm)
        truths.append(w_true)
    init = np.asarray(
        phasecorr.phase_init_warps(
            jnp.asarray(np.stack(tms)), jnp.asarray(ref),
            MotionType.Affine, rotation=True,
        )
    )
    for i, tr in enumerate(truths):
        assert np.abs(init[i] - tr).max() < 0.6, (i, init[i], tr)


def test_rotation_init_gates_garbage_estimates():
    """Heavy per-frame noise on isotropic content makes the log-polar
    estimate garbage (the expected spectrum is rotation-invariant); the
    response gate must fall back to rotation-free init rather than
    inject a wrong rotation."""
    rng = np.random.default_rng(9)
    h, w = 192, 512
    base = cv2.GaussianBlur(
        (rng.random((h * 2, w * 2)) * 255).astype(np.float32), (0, 0), 2.5
    )

    def frame(ang):
        m = cv2.getRotationMatrix2D((w, h), ang, 1.0)
        cur = cv2.warpAffine(base, m, (w * 2, h * 2), flags=cv2.INTER_LINEAR)
        c = cur[h // 2 : h // 2 + h, w // 2 : w // 2 + w]
        return c + rng.normal(0, 12, c.shape).astype(np.float32)

    tm, im = frame(1.2), frame(-1.1)
    theta, scale, resp = phasecorr.phase_correlate_rotscale(
        jnp.asarray(tm)[None], jnp.asarray(im)
    )
    init = np.asarray(
        phasecorr.phase_init_warps(
            jnp.asarray(tm)[None], jnp.asarray(im),
            MotionType.Euclidean, rotation=True,
        )
    )
    if float(resp[0]) < phasecorr._MIN_RS_RESPONSE:
        # gated: linear part must be exactly the identity
        np.testing.assert_array_equal(init[0, :2, :2], np.eye(2, dtype=np.float32))
    else:
        # if the estimator does see it, it must be roughly right
        assert abs(float(theta[0]) - (-0.0401)) < 0.02


def test_rotation_init_euclidean_forces_unit_scale():
    ref, tm, _ = _rotated_pair(1.5, 1.0, 2.0, 1.0)
    init = np.asarray(
        phasecorr.phase_init_warps(
            jnp.asarray(tm)[None], jnp.asarray(ref),
            MotionType.Euclidean, rotation=True,
        )
    )
    r = init[0, :2, :2]
    np.testing.assert_allclose(r @ r.T, np.eye(2), atol=1e-5)


def test_pipeline_phase_init_matches_identity_init():
    """ecc_match_arrays output with phase_init on == off (same converged
    warps, same stack) on a translated burst."""
    from libstacker_tpu.models.ecc import ecc_match_arrays

    rng = np.random.default_rng(21)
    pad = 16
    h, w = 192, 256
    base = rng.integers(0, 256, size=(h + 2 * pad, w + 2 * pad))
    base = cv2.GaussianBlur(base.astype(np.float32), (0, 0), 3.0)
    frames = []
    for i in range(4):
        m = np.float32([[1, 0, 2.5 * i], [0, 1, -1.5 * i]])
        cur = cv2.warpAffine(
            base, m, (w + 2 * pad, h + 2 * pad),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        )[pad : pad + h, pad : pad + w]
        frames.append(np.clip(cur, 0, 255).astype(np.uint8))
    burst = np.stack(frames)[..., None].repeat(3, axis=-1)

    kw = dict(scale_down_width=None, on_failure="raise")
    p_on = EccMatchParameters(
        motion_type=MotionType.Translation, max_count=100, epsilon=1e-5,
        phase_init=True,
    )
    p_off = EccMatchParameters(
        motion_type=MotionType.Translation, max_count=100, epsilon=1e-5,
        phase_init=False,
    )
    out_on, st_on = ecc_match_arrays(burst, p_on, return_stats=True, **kw)
    out_off, st_off = ecc_match_arrays(burst, p_off, return_stats=True, **kw)
    # both converge inside the same eps ball; warps may differ by
    # ~0.01 px, moving isolated bilinear samples ~1 grey level
    np.testing.assert_allclose(out_on, out_off, atol=8e-3)
    assert sum(st_on.ecc_iterations) <= sum(st_off.ecc_iterations)
