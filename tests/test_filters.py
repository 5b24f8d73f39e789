"""Filter primitive parity vs OpenCV (SURVEY.md N12-N14)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.ops import filters


def test_gaussian_kernel_small_tables():
    for k in (1, 3, 5, 7):
        expected = cv2.getGaussianKernel(k, 0).ravel()
        got = np.array(filters.gaussian_kernel(k, 0.0))
        np.testing.assert_allclose(got, expected, atol=1e-12)


def test_gaussian_kernel_computed_sigma():
    expected = cv2.getGaussianKernel(9, 0, cv2.CV_64F).ravel()
    got = np.array(filters.gaussian_kernel(9, 0.0))
    np.testing.assert_allclose(got, expected, atol=1e-12)
    expected = cv2.getGaussianKernel(5, 1.7, cv2.CV_64F).ravel()
    got = np.array(filters.gaussian_kernel(5, 1.7))
    np.testing.assert_allclose(got, expected, atol=1e-12)


@pytest.mark.parametrize("ksize", [1, 3, 5, 7])
def test_deriv_kernels_match_cv2(ksize):
    for dx, dy in [(1, 0), (0, 1), (2, 0)]:
        if ksize == 1 and (dx > 2 or dy > 2):
            continue
        kx, ky = cv2.getDerivKernels(dx, dy, ksize)
        np.testing.assert_allclose(
            np.array(filters.deriv_kernel(dx, ksize)), kx.ravel(), atol=1e-12
        )
        np.testing.assert_allclose(
            np.array(filters.deriv_kernel(dy, ksize)), ky.ravel(), atol=1e-12
        )


def test_sep_filter2d_matches_cv2(noise_image):
    img = noise_image.astype(np.float32)
    m = np.array([-1.0, 2.0, -1.0])
    g = cv2.getGaussianKernel(3, -1).ravel()
    expected = cv2.sepFilter2D(img.astype(np.float64), cv2.CV_64F, m, g)
    got = np.asarray(filters.sep_filter2d(jnp.asarray(img), tuple(m), tuple(g)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("ksize", [1, 3, 5, 7])
def test_sobel_matches_cv2(noise_image, ksize):
    img = noise_image.astype(np.float32)
    for dx, dy in [(1, 0), (0, 1)]:
        expected = cv2.Sobel(img.astype(np.float64), cv2.CV_64F, dx, dy, ksize=ksize)
        got = np.asarray(filters.sobel(jnp.asarray(img), dx, dy, ksize=ksize))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=2e-2)


def test_laplacian_matches_cv2(noise_image):
    img = noise_image.astype(np.float32)
    expected = cv2.Laplacian(
        img.astype(np.float64), cv2.CV_64F, ksize=3, borderType=cv2.BORDER_REPLICATE
    )
    got = np.asarray(filters.laplacian(jnp.asarray(img), ksize=3, border="replicate"))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3)


def test_gaussian_blur_matches_cv2(noise_image):
    img = noise_image.astype(np.float32)
    for k in (3, 5, 7, 9):
        expected = cv2.GaussianBlur(img, (k, k), 0)
        got = np.asarray(filters.gaussian_blur(jnp.asarray(img), k))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-3)


def test_border_modes_match_cv2(noise_image):
    img = noise_image.astype(np.float32)
    k = np.array([0.25, 0.5, 0.25])
    for name, cvmode in [
        ("reflect101", cv2.BORDER_REFLECT_101),
        ("replicate", cv2.BORDER_REPLICATE),
        ("reflect", cv2.BORDER_REFLECT),
    ]:
        expected = cv2.sepFilter2D(img, -1, k, k, borderType=cvmode)
        got = np.asarray(
            filters.sep_filter2d(jnp.asarray(img), tuple(k), tuple(k), border=name)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)
