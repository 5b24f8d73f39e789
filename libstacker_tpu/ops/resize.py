"""Resize ops (INTER_AREA / INTER_LINEAR / INTER_NEAREST) as matmuls.

The reference's ``scale_image`` helper (src/utils.rs:186-214) shrinks with
``imgproc::resize`` INTER_AREA so that the **smaller** of (width, height)
equals ``scale_down`` (despite its docs saying "width" — see
src/utils.rs:192-196).  ORB's pyramid uses INTER_LINEAR.

TPU design: both area-averaging and bilinear resize are *separable* linear
maps, so we materialise per-axis weight matrices on host (cached) and
apply them as two dense matmuls — this runs on the MXU instead of a
scatter/gather loop, and XLA fuses the pair.  Weight construction
reproduces OpenCV semantics:

- INTER_AREA: each dst pixel averages the exact fractional source span
  ``[x*scale, (x+1)*scale)`` (for enlargement the span covers <= 2 taps;
  this matches cv2's zoom path exactly, verified by operator probing).
- INTER_LINEAR: src coord = (dst + 0.5) * scale - 0.5, edge-clamped.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..errors import InvalidParamsError


@functools.lru_cache(maxsize=256)
def _area_weights(src: int, dst: int) -> np.ndarray:
    """[dst, src] float32 area-averaging weights (true INTER_AREA shrink)."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float64)
    inv = 1.0 / scale
    for x in range(dst):
        f0 = x * scale
        f1 = min(f0 + scale, float(src))
        j0 = int(math.floor(f0))
        j1 = int(math.ceil(f1))
        for j in range(j0, min(j1, src)):
            overlap = min(j + 1.0, f1) - max(float(j), f0)
            if overlap > 0:
                w[x, j] = overlap * inv
    # Normalise rows to guard against float drift at the right edge.
    w /= w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _linear_weights(src: int, dst: int) -> np.ndarray:
    """[dst, src] float32 bilinear weights with OpenCV coordinate mapping."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float64)
    for x in range(dst):
        fx = (x + 0.5) * scale - 0.5
        sx = int(math.floor(fx))
        frac = fx - sx
        if sx < 0:
            sx, frac = 0, 0.0
        if sx >= src - 1:
            sx, frac = src - 2, 1.0
        if src == 1:
            w[x, 0] = 1.0
        else:
            w[x, sx] += 1.0 - frac
            w[x, sx + 1] += frac
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_index(src: int, dst: int) -> np.ndarray:
    scale = src / dst
    idx = np.minimum(np.floor(np.arange(dst) * scale), src - 1).astype(np.int32)
    return idx


def resize(
    img: jnp.ndarray,
    dsize: Tuple[int, int],
    interpolation: int = constants.INTER_LINEAR,
) -> jnp.ndarray:
    """Resize ``[..., H, W]`` or ``[..., H, W, C]`` to ``dsize=(h, w)``.

    Float inputs stay float; uint8 inputs are computed in f32 and rounded
    back to uint8 (OpenCV's fixed-point path agrees within 1 LSB).
    """
    dh, dw = int(dsize[0]), int(dsize[1])
    has_channels = img.ndim >= 3 and img.shape[-1] <= 4
    if has_channels:
        sh, sw = img.shape[-3], img.shape[-2]
    else:
        sh, sw = img.shape[-2], img.shape[-1]
    if dh <= 0 or dw <= 0:
        raise InvalidParamsError(f"invalid dsize {dsize}")

    in_dtype = img.dtype
    if interpolation == constants.INTER_NEAREST:
        yi = jnp.asarray(_nearest_index(sh, dh))
        xi = jnp.asarray(_nearest_index(sw, dw))
        if has_channels:
            return img[..., yi, :, :][..., :, xi, :]
        return img[..., yi, :][..., :, xi]

    if interpolation == constants.INTER_AREA:
        # True fractional area weighting on both axes; for upscale the
        # source span is shorter than a pixel and covers <= 2 taps, which
        # is exactly what cv2's INTER_AREA zoom path computes (verified
        # against cv2 5.0 by operator probing in tests).
        wy, wx = _area_weights(sh, dh), _area_weights(sw, dw)
    elif interpolation == constants.INTER_LINEAR:
        wy, wx = _linear_weights(sh, dh), _linear_weights(sw, dw)
    else:
        raise InvalidParamsError(f"unsupported interpolation {interpolation}")

    wy = jnp.asarray(wy)
    wx = jnp.asarray(wx)
    x = img.astype(jnp.float32)
    if has_channels:
        out = jnp.einsum("ay,...ywc->...awc", wy, x, precision="highest")
        out = jnp.einsum("bx,...axc->...abc", wx, out, precision="highest")
    else:
        out = jnp.einsum("ay,...yw->...aw", wy, x, precision="highest")
        out = jnp.einsum("bx,...ax->...ab", wx, out, precision="highest")
    if in_dtype == jnp.uint8:
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(in_dtype)
    return out


def scale_image_size(height: int, width: int, scale_down: float) -> Tuple[int, int]:
    """New (h, w) for ``scale_image``: scales so the *smaller* dimension
    equals ``scale_down`` (ref src/utils.rs:192-199, including the
    truncating ``as i32`` casts)."""
    if width < height:
        factor = float(scale_down) / float(width)
    else:
        factor = float(scale_down) / float(height)
    return int(height * factor), int(width * factor)


def scale_image(img: jnp.ndarray, scale_down: float) -> jnp.ndarray:
    """INTER_AREA rescale with the reference's smaller-dimension semantics
    (ref src/utils.rs:186-214)."""
    has_channels = img.ndim >= 3 and img.shape[-1] <= 4
    if has_channels:
        h, w = img.shape[-3], img.shape[-2]
    else:
        h, w = img.shape[-2], img.shape[-1]
    nh, nw = scale_image_size(h, w, scale_down)
    return resize(img, (nh, nw), constants.INTER_AREA)
