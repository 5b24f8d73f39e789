"""Sharpness metric parity vs the reference's OpenCV formulas
(SURVEY.md R10-R13; oracles recomputed with cv2 exactly as
ref src/lib.rs:1032-1166 does)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from libstacker_tpu.errors import InvalidParamsError
from libstacker_tpu.ops import sharpness


def _lapm_oracle(img):
    m = np.array([-1.0, 2.0, -1.0])
    g = cv2.getGaussianKernel(3, -1).ravel()
    lx = cv2.sepFilter2D(img.astype(np.float64), cv2.CV_64F, m, g)
    ly = cv2.sepFilter2D(img.astype(np.float64), cv2.CV_64F, g, m)
    return float(np.mean(np.abs(lx) + np.abs(ly)))


def _lapv_oracle(img):
    lap = cv2.Laplacian(img.astype(np.float64), cv2.CV_64F, ksize=3,
                        borderType=cv2.BORDER_REPLICATE)
    return float(lap.std() ** 2)


def _teng_oracle(img, k):
    gx = cv2.Sobel(img.astype(np.float64), cv2.CV_64F, 1, 0, ksize=k)
    gy = cv2.Sobel(img.astype(np.float64), cv2.CV_64F, 0, 1, ksize=k)
    return float(np.mean(gx * gx + gy * gy))


def _glvn_oracle(img):
    f = img.astype(np.float64)
    return float(f.std() ** 2 / max(f.mean(), np.finfo(np.float64).eps))


def test_lapm(noise_image):
    got = float(sharpness.sharpness_modified_laplacian(jnp.asarray(noise_image)))
    assert got == pytest.approx(_lapm_oracle(noise_image), rel=1e-4)


def test_lapv(noise_image):
    got = float(sharpness.sharpness_variance_of_laplacian(jnp.asarray(noise_image)))
    assert got == pytest.approx(_lapv_oracle(noise_image), rel=1e-4)


@pytest.mark.parametrize("k", [1, 3, 5, 7])
def test_teng(noise_image, k):
    got = float(sharpness.sharpness_tenengrad(jnp.asarray(noise_image), k))
    assert got == pytest.approx(_teng_oracle(noise_image, k), rel=1e-4)


def test_teng_invalid_ksize(noise_image):
    with pytest.raises(InvalidParamsError):
        sharpness.sharpness_tenengrad(jnp.asarray(noise_image), 4)


def test_glvn(noise_image):
    got = float(
        sharpness.sharpness_normalized_gray_level_variance(jnp.asarray(noise_image))
    )
    assert got == pytest.approx(_glvn_oracle(noise_image), rel=1e-4)


def test_batched_matches_per_frame(noise_image):
    batch = np.stack([noise_image, noise_image[::-1].copy()], axis=0)
    out = sharpness.sharpness_all(jnp.asarray(batch))
    assert out["teng"].shape == (2,)
    assert float(out["teng"][0]) == pytest.approx(_teng_oracle(batch[0], 3), rel=1e-4)
    assert float(out["lapv"][1]) == pytest.approx(_lapv_oracle(batch[1]), rel=1e-4)
