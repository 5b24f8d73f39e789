"""Pallas warp kernel logic tests (interpret mode — runs on CPU).

On TPU the kernel is bit-identical to the gather path (verified on
hardware); interpret mode checks the same tile/window/shift logic in CI.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import warp, warp_pallas


@pytest.fixture(scope="module")
def img(rng):
    return cv2.GaussianBlur(
        rng.random((192, 512)).astype(np.float32), (0, 0), 2.0
    )


def _compare(img, m3, frac=0.0, **kw):
    got = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(img)[None], jnp.asarray(m3, jnp.float32)[None],
            interpret=True, **kw,
        )[0]
    )
    ref = np.asarray(
        warp.warp_perspective(
            jnp.asarray(img), jnp.asarray(m3, jnp.float32),
            (img.shape[0], img.shape[1]), inverse_map=True,
        )
    )
    diff = np.abs(got - ref)
    # identical quantisation; rare f32 op-order flips at exact 1/32-bin
    # boundaries are bounded by one interpolation step
    assert (diff > 1e-5).mean() <= frac, f"{(diff > 1e-5).mean()} off"
    assert diff.max() < (0.02 if frac else 1e-5), diff.max()


def test_identity(img):
    _compare(img, np.eye(3))


def test_translation(img):
    m = np.eye(3); m[0, 2] = 17.25; m[1, 2] = -4.5
    _compare(img, m)


def test_rotation_scale_perspective(img):
    m = cv2.getRotationMatrix2D((256.0, 96.0), 1.4, 1.01)
    m3 = np.vstack([m, [1e-6, -2e-6, 1.0]])
    _compare(img, m3, frac=1e-3)


def test_large_translation_outside(img):
    # shifts a large region out of the image: border-constant zeros
    m = np.eye(3); m[0, 2] = 300.0; m[1, 2] = 150.0
    _compare(img, m)


def test_border_value(img):
    m = np.eye(3); m[0, 2] = -40.0
    got = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            jnp.asarray(img)[None], jnp.asarray(m, jnp.float32)[None],
            border_value=0.25, interpret=True,
        )[0]
    )
    # columns x < 40 sample sx = x - 40 < 0 -> border value
    np.testing.assert_allclose(got[:, :39], 0.25, atol=1e-6)


def test_shared_source_indirection(img):
    img2 = img[::-1].copy()
    srcs = jnp.stack([jnp.asarray(img), jnp.asarray(img2)])
    m = np.eye(3, dtype=np.float32)
    m3 = jnp.asarray(np.stack([m, m, m]))
    idx = jnp.asarray([1, 0, 1], jnp.int32)
    out = np.asarray(
        warp_pallas.warp_bilinear_pallas(
            srcs, m3, src_index=idx, interpret=True
        )
    )
    np.testing.assert_allclose(out[0], img2, atol=1e-6)
    np.testing.assert_allclose(out[1], img, atol=1e-6)
    np.testing.assert_allclose(out[2], img2, atol=1e-6)


def test_warp3_matches_single_source(img):
    """The fused 3-source kernel (ECC inner-loop path) must match three
    independent single-source warps."""
    srcs = jnp.stack(
        [jnp.asarray(img), jnp.asarray(img) * 0.5, jnp.asarray(img[::-1].copy())]
    )
    ms = []
    for i in range(2):
        m = cv2.getRotationMatrix2D((256.0, 96.0), 0.4 * i, 1.0)
        m[0, 2] += 1.5 * i
        ms.append(np.vstack([m, [0, 0, 1]]).astype(np.float32))
    m3 = jnp.asarray(np.stack(ms))
    out = np.asarray(
        warp_pallas.warp3_bilinear_pallas(srcs, m3, interpret=True)
    )
    assert out.shape == (2, 3, img.shape[0], img.shape[1])
    for b in range(2):
        for c in range(3):
            ref = np.asarray(
                warp_pallas.warp_bilinear_pallas(
                    srcs[c][None], m3[b][None], interpret=True
                )[0]
            )
            np.testing.assert_allclose(out[b, c], ref, atol=1e-6)
