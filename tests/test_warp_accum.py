"""Fused warp+accumulate kernel tests (interpret mode — runs on CPU).

Stage 3 of both pipelines is "warp every frame onto frame 0's grid,
masked-sum over frames" (ref src/lib.rs:291-316, 780-814); the fused
kernel (ops/warp_accum_pallas) does it in one sweep.  On TPU it is
bit-identical to the unfused kernel path (verified on hardware by
bench.py's parity check); interpret mode checks the interleaved-window
logic in CI against the exact XLA path.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import warp_batch
from libstacker_tpu.ops.warp_accum_pallas import warp_accum_rgb_pallas


@pytest.fixture(scope="module")
def burst():
    rng = np.random.default_rng(77)  # local: see conftest rng note
    frames = np.stack([
        cv2.GaussianBlur(
            rng.random((192, 512, 3)).astype(np.float32), (0, 0), 1.5
        )
        for _ in range(4)
    ])
    mats = []
    for i in range(4):
        m = cv2.getRotationMatrix2D((256.0, 96.0), 0.3 * i, 1.0 + 0.001 * i)
        m[0, 2] += 3.25 * i
        m[1, 2] -= 1.5 * i
        mats.append(np.vstack([m, [0, 0, 1]]).astype(np.float32))
    return frames, np.stack(mats)


def _unfused(frames, mats, oks, border_value=0.0, perspective=True):
    warped = warp_batch.warp_frames_batch(
        jnp.asarray(frames), jnp.asarray(mats), perspective=perspective,
        border_value=border_value, allow_pallas=False,
    )
    return np.asarray(
        jnp.sum(
            warped * jnp.asarray(oks, jnp.float32)[:, None, None, None],
            axis=0,
        )
    )


def _fused(frames, mats, oks, border_value=0.0, k=7, quant_affine=False,
           tile=(128, 128)):
    minv = np.linalg.inv(mats.astype(np.float64)).astype(np.float32)
    return np.asarray(
        warp_accum_rgb_pallas(
            jnp.asarray(frames), jnp.asarray(minv),
            jnp.asarray(oks, jnp.float32), border_value=border_value,
            k=k, tile=tile, quant_affine=quant_affine, interpret=True,
        )
    )


def test_fused_matches_unfused(burst):
    frames, mats = burst
    oks = np.asarray([True, True, False, True])
    want = _unfused(frames, mats, oks)
    got = _fused(frames, mats, oks)
    d = np.abs(got - want)
    # same 1/32-px quantisation; isolated interpret-mode FMA flips at
    # bin boundaries are bounded by one interpolation step
    assert (d > 1e-5).mean() <= 1e-3, (d > 1e-5).mean()
    assert d.max() < 0.02, d.max()


def test_fused_k1_translations(burst):
    frames, _ = burst
    mats = np.stack([np.eye(3, dtype=np.float32)] * 4)
    for i in range(4):
        mats[i, 0, 2] = 11.25 * i
        mats[i, 1, 2] = -6.5 * i
    oks = np.ones(4, bool)
    want = _unfused(frames, mats, oks)
    got = _fused(frames, mats, oks, k=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_affine_quantisation(burst):
    """quant_affine mirrors warp_affine's AB_BITS=10 fixed point."""
    frames, _ = burst
    mats = np.stack([np.eye(3, dtype=np.float32)] * 2)
    mats[1, 0, 2] = 4.3
    mats[1, 1, 2] = -2.7
    oks = np.ones(2, bool)
    want = _unfused(frames[:2], mats, oks, perspective=False)
    got = _fused(frames[:2], mats, oks, k=1, quant_affine=True)
    d = np.abs(got - want)
    assert (d > 1e-5).mean() <= 1e-3, (d > 1e-5).mean()
    assert d.max() < 0.02, d.max()


def test_fused_border_value(burst):
    """Out-of-source taps take the per-channel border value, scaled by
    each lane's validity (matches warped*ok summation)."""
    frames, _ = burst
    mats = np.stack([np.eye(3, dtype=np.float32)] * 2)
    mats[1, 0, 2] = -60.0  # shifts right edge out of source
    oks = np.asarray([True, True])
    bv = np.asarray([0.25, 0.5, 0.75], np.float32)
    want = _unfused(frames[:2], mats, oks, border_value=bv)
    got = _fused(frames[:2], mats, oks, border_value=bv)
    d = np.abs(got - want)
    assert (d > 1e-5).mean() <= 1e-3, (d > 1e-5).mean()
    assert d.max() < 0.02, d.max()


def test_dropped_lane_nan_matrix(burst):
    """warp_accumulate_rgb: a dropped lane's NaN matrix must not poison
    the sum (the wrapper swaps in identity before inverting)."""
    frames, mats = burst
    mats = mats.copy()
    mats[2] = np.nan
    oks = jnp.asarray([True, True, False, True])
    out = np.asarray(
        warp_batch.warp_accumulate_rgb(
            jnp.asarray(frames), jnp.asarray(mats), oks,
            allow_pallas=False,
        )
    )
    assert np.isfinite(out).all()
    want = _unfused(
        frames[[0, 1, 3]], np.asarray(mats)[[0, 1, 3]], np.ones(3, bool)
    )
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_wrapper_small_image_falls_back(monkeypatch):
    """Images below the window minimum take the unfused path instead of
    raising inside the kernel."""
    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    rng = np.random.default_rng(3)
    frames = rng.random((2, 96, 400, 3)).astype(np.float32)
    mats = np.stack([np.eye(3, dtype=np.float32)] * 2)
    out = np.asarray(
        warp_batch.warp_accumulate_rgb(
            jnp.asarray(frames), jnp.asarray(mats), jnp.ones(2, bool)
        )
    )
    np.testing.assert_allclose(out, frames.sum(0), atol=1e-5)


def test_kernel_rejects_bad_k(burst):
    frames, mats = burst
    minv = np.linalg.inv(mats.astype(np.float64)).astype(np.float32)
    with pytest.raises(ValueError):
        warp_accum_rgb_pallas(
            jnp.asarray(frames), jnp.asarray(minv), jnp.ones(4),
            k=0, interpret=True,
        )


def _u8(frames):
    return np.clip(np.round(frames * 255.0), 0, 255).astype(np.uint8)


def _flip_bounded(got, want, atol=1e-5, frac=1e-3):
    """Interpret-mode FMA flips at quantisation-bin / coverage
    boundaries are isolated; bound their fraction, not their size
    (a coverage flip changes a count by a whole 1.0)."""
    for g, w_ in zip(got, want):
        d = np.abs(np.asarray(g) - np.asarray(w_))
        assert (d > atol).mean() <= frac, (d > atol).mean()


def test_fused_moments_matches_unfused(burst, monkeypatch):
    """warp_moments_rgb_pallas (sigma-clip pass 0) vs the unfused
    coverage-masked moment sweep of ops/stack."""
    from libstacker_tpu.ops import stack as stack_ops

    frames, mats = burst
    oks = np.asarray([True, True, False, True])
    args = (
        jnp.asarray(_u8(frames)), jnp.asarray(mats),
        jnp.asarray(oks), True,
    )
    want = stack_ops._moments_chunk(*args, fused=False)
    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    monkeypatch.setenv("LIBSTACKER_WARP_INTERPRET", "1")
    got = stack_ops._moments_chunk(*args, fused=True)
    _flip_bounded(got, want)


def test_fused_clipped_moments_match_unfused(burst, monkeypatch):
    """The clip pass (mu/tol per-lane inputs resident across frames)."""
    from libstacker_tpu.ops import stack as stack_ops

    frames, mats = burst
    oks = np.ones(4, bool)
    args = (jnp.asarray(_u8(frames)), jnp.asarray(mats),
            jnp.asarray(oks))
    s0, s1, s2 = stack_ops._moments_chunk(*args, True, fused=False)
    denom = jnp.maximum(s0, 1.0)[..., None]
    mu = s1 / denom
    var = jnp.maximum(s2 / denom - mu * mu, 0.0)
    tol = 1.5 * jnp.sqrt(var) + np.float32(0.5 / 255.0)
    want = stack_ops._clipped_chunk(*args, mu, tol, True, fused=False)
    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    monkeypatch.setenv("LIBSTACKER_WARP_INTERPRET", "1")
    got = stack_ops._clipped_chunk(*args, mu, tol, True, fused=True)
    _flip_bounded(got, want)


@pytest.mark.parametrize("hw", [(192, 400), (161, 512)])
def test_fused_moments_non_aligned_sizes(hw, monkeypatch):
    """Moments kernel at non-(8,128)-aligned sizes (the r2 warp-kernel
    corruption class): the hp/wp padding + ragged output tiles must not
    leak pad garbage into the accumulators."""
    from libstacker_tpu.ops import stack as stack_ops

    h, w = hw
    rng = np.random.default_rng(57)  # local: see conftest rng note
    frames = rng.integers(0, 256, (3, h, w, 3), np.uint8)
    mats = np.stack([np.eye(3, dtype=np.float32)] * 3)
    for i in range(3):
        mats[i, 0, 2] = 2.3 * i - 1.7
        mats[i, 1, 2] = -1.1 * i + 0.6
    oks = np.ones(3, bool)
    args = (jnp.asarray(frames), jnp.asarray(mats), jnp.asarray(oks), True)
    want = stack_ops._moments_chunk(*args, fused=False)
    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    monkeypatch.setenv("LIBSTACKER_WARP_INTERPRET", "1")
    got = stack_ops._moments_chunk(*args, fused=True)
    _flip_bounded(got, want)


def test_sr_deposit_non_aligned_size(monkeypatch):
    """SR kernel at a non-aligned size via super_res_stack dispatch."""
    from libstacker_tpu.ops import stack as stack_ops

    h, w = 161, 400
    rng = np.random.default_rng(59)  # local: see conftest rng note
    base = rng.integers(0, 256, (h, w, 3), np.uint8)
    frames = np.stack(
        [base] + [np.roll(base, (1, -2 + i), (0, 1)) for i in range(2)]
    )
    mats = np.stack([np.eye(3, dtype=np.float32)] * 2)
    mats[0, 0, 2] = 0.4
    mats[1, 1, 2] = -0.55
    oks = np.ones(2, bool)
    want = np.asarray(stack_ops.super_res_stack(
        jnp.asarray(frames), jnp.asarray(mats), jnp.asarray(oks),
        factor=2, perspective=True, chunk=3,
    ))
    monkeypatch.setenv("LIBSTACKER_FORCE_PALLAS", "1")
    monkeypatch.setenv("LIBSTACKER_WARP_INTERPRET", "1")
    got = np.asarray(stack_ops.super_res_stack(
        jnp.asarray(frames), jnp.asarray(mats), jnp.asarray(oks),
        factor=2, perspective=True, chunk=3,
    ))
    d = np.abs(got - want)
    assert (d > 1e-4).mean() <= 1e-3, (d > 1e-4).mean()


def test_fused_large_rotation_shrunk_tile():
    """Stage-3 accumulation of a large (10 deg) rotation through the
    tile-shrink rung (k=15, 64-row tiles) matches the exact XLA path —
    the dispatch config that keeps large legitimate motions at kernel
    speed (the reference warps arbitrary homographies at full C++
    speed, src/lib.rs:291-299)."""
    rng = np.random.default_rng(91)  # local: see conftest rng note
    frames = np.stack([
        cv2.GaussianBlur(
            rng.random((192, 512, 3)).astype(np.float32), (0, 0), 1.5
        )
        for _ in range(2)
    ])
    mats = []
    for ang in (10.0, -9.0):
        m = cv2.getRotationMatrix2D((256.0, 96.0), ang, 1.0)
        mats.append(np.vstack([m, [0, 0, 1]]).astype(np.float32))
    mats = np.stack(mats)
    oks = np.asarray([True, True])
    want = _unfused(frames, mats, oks)
    got = _fused(frames, mats, oks, k=15, tile=(64, 128))
    d = np.abs(got - want)
    assert (d > 1e-5).mean() <= 2e-3, (d > 1e-5).mean()
    assert d.max() < 0.02, d.max()


def test_integer_source_bitwise_matches_f32():
    """r4: the kernel DMAs RAW uint8/uint16 windows (4x/2x less HBM
    traffic) and widens+normalises in-VMEM — results must be BITWISE
    identical to feeding color.to_unit_f32(frames), for the plain
    accumulate, the moments pass, and the clip pass (on-chip smoke
    2026-08-20 confirmed the same on real Mosaic; bench.py's parity
    check re-asserts it every round)."""
    from libstacker_tpu.ops import color
    from libstacker_tpu.ops.warp_accum_pallas import (
        warp_moments_rgb_pallas,
    )

    rng = np.random.default_rng(79)
    h, w = 192, 512
    frames_u8 = rng.integers(0, 256, (3, h, w, 3), np.uint8)
    mats = np.stack([np.eye(3, dtype=np.float32)] * 3)
    mats[1, 0, 2] = -3.5
    mats[1, 1, 2] = 2.25
    mats[2, 0, 2] = 5.0
    minv = np.linalg.inv(mats)
    oks = jnp.asarray([1.0, 1.0, 0.0])
    for raw in (frames_u8, frames_u8.astype(np.uint16) * 257):
        f32 = color.to_unit_f32(jnp.asarray(raw))
        a = np.asarray(warp_accum_rgb_pallas(
            f32, jnp.asarray(minv), oks, k=3, tile=(64, 128),
            interpret=True,
        ))
        b = np.asarray(warp_accum_rgb_pallas(
            jnp.asarray(raw), jnp.asarray(minv), oks, k=3,
            tile=(64, 128), interpret=True,
        ))
        np.testing.assert_array_equal(a, b)
    f32 = color.to_unit_f32(jnp.asarray(frames_u8))
    s = warp_moments_rgb_pallas(
        f32, jnp.asarray(minv), oks, k=3, tile=(64, 128), interpret=True
    )
    t = warp_moments_rgb_pallas(
        jnp.asarray(frames_u8), jnp.asarray(minv), oks, k=3,
        tile=(64, 128), interpret=True,
    )
    for x, y in zip(s, t):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mu = jnp.asarray(np.asarray(s[1]) / np.maximum(np.asarray(s[0]), 1))
    tol = jnp.full((h, w, 3), 0.02, jnp.float32)
    s2 = warp_moments_rgb_pallas(
        f32, jnp.asarray(minv), oks, mu=mu, tol=tol, k=3,
        tile=(64, 128), interpret=True,
    )
    t2 = warp_moments_rgb_pallas(
        jnp.asarray(frames_u8), jnp.asarray(minv), oks, mu=mu, tol=tol,
        k=3, tile=(64, 128), interpret=True,
    )
    for x, y in zip(s2, t2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
