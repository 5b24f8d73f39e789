"""Resize parity vs OpenCV INTER_AREA / INTER_LINEAR (SURVEY.md N19)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu import constants
from libstacker_tpu.ops import resize


@pytest.mark.parametrize("dsize", [(40, 50), (33, 47), (97, 131), (13, 19)])
def test_area_shrink_f32_matches_cv2(noise_image, dsize):
    img = noise_image.astype(np.float32) / 255.0
    expected = cv2.resize(img, (dsize[1], dsize[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(resize.resize(jnp.asarray(img), dsize, constants.INTER_AREA))
    np.testing.assert_allclose(got, expected, rtol=0, atol=2e-6)


@pytest.mark.parametrize("dsize", [(40, 50), (33, 47)])
def test_area_shrink_u8_matches_cv2(noise_image, dsize):
    expected = cv2.resize(
        noise_image, (dsize[1], dsize[0]), interpolation=cv2.INTER_AREA
    )
    got = np.asarray(
        resize.resize(jnp.asarray(noise_image), dsize, constants.INTER_AREA)
    )
    diff = np.abs(got.astype(int) - expected.astype(int))
    assert diff.max() <= 1


@pytest.mark.parametrize("dsize", [(40, 50), (150, 200), (97, 200)])
def test_linear_f32_matches_cv2(noise_image, dsize):
    img = noise_image.astype(np.float32) / 255.0
    expected = cv2.resize(img, (dsize[1], dsize[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize.resize(jnp.asarray(img), dsize, constants.INTER_LINEAR))
    np.testing.assert_allclose(got, expected, rtol=0, atol=2e-3)


def test_area_enlarge_matches_cv2(noise_image):
    img = noise_image.astype(np.float32) / 255.0
    expected = cv2.resize(img, (262, 194), interpolation=cv2.INTER_AREA)
    got = np.asarray(
        resize.resize(jnp.asarray(img), (194, 262), constants.INTER_AREA)
    )
    np.testing.assert_allclose(got, expected, rtol=0, atol=2e-6)


def test_scale_image_semantics_landscape(noise_image):
    # landscape: width(131) > height(97) -> smaller dim (height) scaled to 50
    h, w = resize.scale_image_size(97, 131, 50.0)
    factor = 50.0 / 97.0
    assert (h, w) == (int(97 * factor), int(131 * factor))
    out = resize.scale_image(jnp.asarray(noise_image), 50.0)
    assert out.shape == (h, w)


def test_scale_image_matches_cv2_pipeline(noise_image):
    img = noise_image.astype(np.float32) / 255.0
    h, w = resize.scale_image_size(*img.shape, 48.0)
    expected = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    got = np.asarray(resize.scale_image(jnp.asarray(img), 48.0))
    np.testing.assert_allclose(got, expected, rtol=0, atol=2e-6)


def test_batched_resize(noise_image):
    img = noise_image.astype(np.float32) / 255.0
    batch = np.stack([img, img[::-1].copy()])
    got = np.asarray(resize.resize(jnp.asarray(batch), (40, 50), constants.INTER_AREA))
    assert got.shape == (2, 40, 50)
    exp1 = cv2.resize(batch[1], (50, 40), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(got[1], exp1, rtol=0, atol=2e-6)


@pytest.mark.parametrize(
    "shape,dsize,interp",
    [
        ((540, 960), (450, 800), constants.INTER_LINEAR),
        ((541, 963), (123, 456), constants.INTER_AREA),
        ((217, 391), (181, 326), constants.INTER_LINEAR),
        ((2160 // 4, 3840 // 4), (450, 800), constants.INTER_AREA),
    ],
)
def test_banded_matches_dense_weights(shape, dsize, interp):
    """The block-banded fast path must agree with the dense [dst,src]
    weight matmul it replaces (window includes every nonzero tap;
    1 uint8 LSB allowed for FMA-reassociation ties)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (2,) + shape, np.uint8)
    got = np.asarray(resize.resize(jnp.asarray(img), dsize, interp))

    if interp == constants.INTER_AREA:
        wy = resize._area_weights(shape[0], dsize[0])
        wx = resize._area_weights(shape[1], dsize[1])
    else:
        wy = resize._linear_weights(shape[0], dsize[0])
        wx = resize._linear_weights(shape[1], dsize[1])
    x = jnp.asarray(img).astype(jnp.float32)
    dense = jnp.einsum("ay,...yw->...aw", jnp.asarray(wy), x,
                       precision="highest")
    dense = jnp.einsum("bx,...ax->...ab", jnp.asarray(wx), dense,
                       precision="highest")
    dense = np.asarray(
        jnp.clip(jnp.floor(dense + 0.5), 0, 255).astype(jnp.uint8)
    )
    diff = np.abs(got.astype(int) - dense.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
