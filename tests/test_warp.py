"""Warp kernel parity vs OpenCV warpAffine / warpPerspective
(SURVEY.md N5/N6)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu import constants
from libstacker_tpu.ops import warp


def _assert_warp_close(got, expected, tight=5e-3, loose=0.06, frac=0.01):
    """Warp parity modulo f32-vs-f64 quantisation-bin flips: almost all
    pixels match tightly; rare 1/32-bin boundary flips are bounded by
    one interpolation step of the local dynamic range."""
    diff = np.abs(np.asarray(got) - np.asarray(expected))
    assert (diff > tight).mean() < frac, f"{(diff > tight).mean():.4f} of pixels off"
    assert diff.max() < loose, f"max diff {diff.max()}"


def _affine(angle=7.0, scale=1.02, tx=3.5, ty=-2.25, center=(65.0, 48.0)):
    m = cv2.getRotationMatrix2D(center, angle, scale)
    m[0, 2] += tx
    m[1, 2] += ty
    return m.astype(np.float32)


def _homography():
    m = np.array(
        [
            [1.01, 0.02, 3.0],
            [-0.015, 0.99, -2.0],
            [1.5e-5, -2.0e-5, 1.0],
        ],
        dtype=np.float32,
    )
    return m


@pytest.fixture(scope="module")
def img_f32(rng):
    img = rng.random((97, 131)).astype(np.float32)
    return cv2.GaussianBlur(img, (5, 5), 1.2)


def test_warp_affine_constant(img_f32):
    m = _affine()
    expected = cv2.warpAffine(
        img_f32, m, (131, 97), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    got = np.asarray(warp.warp_affine(jnp.asarray(img_f32), m))
    _assert_warp_close(got, expected)


def test_warp_affine_inverse_map(img_f32):
    m = _affine()
    expected = cv2.warpAffine(
        img_f32, m, (131, 97),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    got = np.asarray(warp.warp_affine(jnp.asarray(img_f32), m, inverse_map=True))
    _assert_warp_close(got, expected)


def test_warp_perspective_constant(img_f32):
    m = _homography()
    expected = cv2.warpPerspective(
        img_f32, m, (131, 97), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    got = np.asarray(warp.warp_perspective(jnp.asarray(img_f32), m))
    _assert_warp_close(got, expected)


def test_warp_perspective_border_value(img_f32):
    m = _homography()
    expected = cv2.warpPerspective(
        img_f32, m, (131, 97), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.5,
    )
    got = np.asarray(
        warp.warp_perspective(jnp.asarray(img_f32), m, border_value=0.5)
    )
    _assert_warp_close(got, expected)


@pytest.mark.parametrize(
    "name,cvmode",
    [
        ("replicate", cv2.BORDER_REPLICATE),
        ("reflect", cv2.BORDER_REFLECT),
        ("reflect101", cv2.BORDER_REFLECT_101),
        ("wrap", cv2.BORDER_WRAP),
    ],
)
def test_warp_perspective_border_modes(img_f32, name, cvmode):
    m = _homography()
    expected = cv2.warpPerspective(
        img_f32, m, (131, 97), flags=cv2.INTER_LINEAR, borderMode=cvmode
    )
    got = np.asarray(
        warp.warp_perspective(jnp.asarray(img_f32), m, border_mode=name)
    )
    _assert_warp_close(got, expected)


def test_warp_border_transparent(img_f32):
    """BORDER_TRANSPARENT: dst pixels whose sample window leaves the
    source keep the base image's values (cv2 leaves dst unmodified)."""
    m = _affine(angle=3.0, tx=20.0, ty=-12.0)
    base = np.full_like(img_f32, 0.625)
    expected = base.copy()
    cv2.warpAffine(
        img_f32, m, (131, 97), dst=expected,
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_TRANSPARENT,
    )
    got = np.asarray(
        warp.warp_affine(
            jnp.asarray(img_f32), m,
            border_mode=constants.BORDER_TRANSPARENT,
            dst=jnp.asarray(base),
        )
    )
    _assert_warp_close(got, expected)
    # default base is zeros
    got0 = np.asarray(
        warp.warp_affine(
            jnp.asarray(img_f32), m, border_mode="transparent"
        )
    )
    expected0 = np.zeros_like(img_f32)
    cv2.warpAffine(
        img_f32, m, (131, 97), dst=expected0,
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_TRANSPARENT,
    )
    _assert_warp_close(got0, expected0)


def test_warp_perspective_border_transparent(img_f32):
    m = _homography()
    m[0, 2] = 25.0
    base = np.full_like(img_f32, 0.25)
    expected = base.copy()
    cv2.warpPerspective(
        img_f32, m, (131, 97), dst=expected,
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_TRANSPARENT,
    )
    got = np.asarray(
        warp.warp_perspective(
            jnp.asarray(img_f32), m, border_mode="transparent",
            dst=jnp.asarray(base),
        )
    )
    _assert_warp_close(got, expected)


def test_warp_perspective_inverse_map(img_f32):
    m = _homography()
    expected = cv2.warpPerspective(
        img_f32, m, (131, 97),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    got = np.asarray(
        warp.warp_perspective(jnp.asarray(img_f32), m, inverse_map=True)
    )
    _assert_warp_close(got, expected)


def test_warp_color_channels(img_f32):
    rgb = np.stack([img_f32, img_f32 * 0.5, img_f32 * 0.25], axis=-1)
    m = _affine()
    expected = cv2.warpAffine(
        rgb, m, (131, 97), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    got = np.asarray(warp.warp_affine(jnp.asarray(rgb), m))
    _assert_warp_close(got, expected)


def test_warp_nearest_matches_cv2(img_f32):
    m = _affine()
    expected = cv2.warpAffine(
        img_f32, m, (131, 97), flags=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
    )
    got = np.asarray(
        warp.warp_affine(
            jnp.asarray(img_f32), m, interpolation=constants.INTER_NEAREST
        )
    )
    mismatch = np.mean(got != expected)
    assert mismatch < 0.01  # rounding ties at half-pixel boundaries


def test_warp_valid_mask_matches_warped_ones(img_f32):
    m = _homography()
    ones = np.ones_like(img_f32, dtype=np.uint8)
    expected = cv2.warpPerspective(
        ones, m, (131, 97),
        flags=cv2.INTER_NEAREST | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    got = np.asarray(
        warp.warp_valid_mask(jnp.asarray(m), (97, 131), (97, 131), inverse_map=True)
    )
    mismatch = np.mean(got != expected)
    assert mismatch < 0.01
