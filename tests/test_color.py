"""Grayscale / dtype conversion parity vs OpenCV (SURVEY.md N17/N18)."""

import cv2
import jax.numpy as jnp
import numpy as np

from libstacker_tpu.ops import color
from libstacker_tpu.utils import io


def test_rgb_to_gray_u8_matches_cvtcolor(noise_rgb):
    bgr = noise_rgb[..., ::-1].copy()
    expected = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    got = np.asarray(color.rgb_to_gray_u8(jnp.asarray(noise_rgb)))
    np.testing.assert_array_equal(got, expected)


def test_rgb_to_gray_u8_batched(noise_rgb):
    batch = np.stack([noise_rgb, noise_rgb[::-1].copy()])
    got = np.asarray(color.rgb_to_gray_u8(jnp.asarray(batch)))
    assert got.shape == batch.shape[:-1]
    exp0 = cv2.cvtColor(batch[0][..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(got[0], exp0)


def test_host_gray_matches_device(noise_rgb):
    host = io.rgb_to_gray_u8_host(noise_rgb)
    dev = np.asarray(color.rgb_to_gray_u8(jnp.asarray(noise_rgb)))
    np.testing.assert_array_equal(host, dev)


def test_u8_to_f32(noise_rgb):
    got = np.asarray(color.u8_to_f32(jnp.asarray(noise_rgb)))
    expected = noise_rgb.astype(np.float32) / 255.0
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-7)
