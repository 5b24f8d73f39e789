"""Patch-extraction kernel (ops/orb_pallas.py) — interpret-mode parity
vs the XLA gather fallback, including under vmap (the ORB pipeline is
vmapped over frames, so the Pallas batching rule must hold)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libstacker_tpu.ops import orb_pallas


@pytest.fixture(scope="module")
def img(rng):
    return rng.random((192, 400)).astype(np.float32) * 255.0


def _xla_patches(img, ys, xs):
    h, w = img.shape
    side = orb_pallas.PATCH_SIDE
    y0 = np.clip(ys - orb_pallas.PATCH_RADIUS, 0, h - side)
    x0 = np.clip(xs - orb_pallas.PATCH_RADIUS, 0, w - side)
    offs = np.arange(side)
    return img[
        y0[:, None, None] + offs[None, :, None],
        x0[:, None, None] + offs[None, None, :],
    ]


def test_extract_patches_interpret(rng, img):
    h, w = img.shape
    ys = rng.integers(31, h - 31, 40).astype(np.int32)
    xs = rng.integers(31, w - 31, 40).astype(np.int32)
    got = np.asarray(
        orb_pallas.extract_patches_pallas(
            jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, _xla_patches(img, ys, xs))


def test_extract_patches_clamped_edges(rng, img):
    """Centres nearer than PATCH_RADIUS to a border shift inward — both
    paths clamp the ORIGIN identically."""
    h, w = img.shape
    ys = np.asarray([0, 5, h - 1, 50], np.int32)
    xs = np.asarray([0, w - 1, 3, 390], np.int32)
    got = np.asarray(
        orb_pallas.extract_patches_pallas(
            jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, _xla_patches(img, ys, xs))


def test_extract_patches_vmap(rng, img):
    """The ORB pipeline vmaps over frames: the kernel's batching rule
    must produce the same patches as per-frame calls."""
    imgs = np.stack([img, img[::-1].copy()])
    ys = rng.integers(31, img.shape[0] - 31, (2, 16)).astype(np.int32)
    xs = rng.integers(31, img.shape[1] - 31, (2, 16)).astype(np.int32)
    got = np.asarray(
        jax.vmap(
            lambda im, y, x: orb_pallas.extract_patches_pallas(
                im, y, x, interpret=True
            )
        )(jnp.asarray(imgs), jnp.asarray(ys), jnp.asarray(xs))
    )
    for i in range(2):
        np.testing.assert_array_equal(
            got[i], _xla_patches(imgs[i], ys[i], xs[i])
        )
