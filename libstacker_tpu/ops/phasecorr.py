"""Batched phase correlation — translation init for the ECC solver.

A capability beyond the reference (libstacker always starts
findTransformECC from the identity, src/lib.rs:769-777): one batched
FFT cross-power pass recovers every frame's global translation to
sub-pixel accuracy, and the Gauss-Newton solve starts from there —
same converged warp (the init only moves the start point inside the
same basin), a fraction of the iterations when the burst has real
pixel-scale shifts.

TPU notes: everything is jittable (``jnp.fft`` lowers to XLA FFT), one
program for the whole burst, and the correlation peak is located with
``argmax`` + a 3-point parabolic refinement — no host round-trip.

Math (matching cv2::phaseCorrelate, modules/imgproc/src/phasecorr.cpp):
for ``a(x) = b(x + t)`` the normalised cross-power spectrum of
``(A, B)`` is ``exp(2πi k·t)`` whose inverse FFT peaks at ``-t``
(wrapped).  With ECC's convention (template = current frame, input =
frame 0, ``template(x) ≈ input(W x)``) the warp translation is ``t``
with ``a = template`` and ``b = input``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..params import MotionType
from . import ecc as ecc_ops

# peak response below this is noise (uncorrelated content / flat
# frames): keep the identity init instead of a garbage shift.  Measured:
# genuinely aligned burst frames score 0.3-0.99; smooth uncorrelated
# noise scores ~0.03.
_MIN_RESPONSE = 0.05


def _hann2d(h: int, w: int) -> jnp.ndarray:
    """Separable Hann window (cv2 createHanningWindow semantics)."""
    wy = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(h, dtype=jnp.float32) / (h - 1)
    )
    wx = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(w, dtype=jnp.float32) / (w - 1)
    )
    return wy[:, None] * wx[None, :]


def _parabolic(c_m1, c_0, c_p1):
    """3-point parabola vertex offset in [-0.5, 0.5]."""
    den = c_m1 - 2.0 * c_0 + c_p1
    off = jnp.where(
        jnp.abs(den) > 1e-12, 0.5 * (c_m1 - c_p1) / den, 0.0
    )
    return jnp.clip(off, -0.5, 0.5)


def _auto_downscale(h: int, w: int) -> int:
    """Smallest power-of-2 pooling factor that brings the correlation
    grid under ~0.6 Mpx (a 4K burst pools 4x: the FFT temporaries of a
    full-res [N,2160,3840] complex cross-power spectrum exceed HBM for
    ~100-lane bursts, and a quarter-res init is still within ~1 px —
    one extra Gauss-Newton iteration at most)."""
    d = 1
    while (h // d) * (w // d) > 600_000 and min(h, w) // (2 * d) >= 64:
        d *= 2
    return d


def _pool(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """d x d average pooling (exact area downsample; trailing rows/cols
    beyond a multiple of d are cropped — irrelevant for correlation)."""
    if d == 1:
        return x
    h, w = x.shape[-2], x.shape[-1]
    hc, wc = (h // d) * d, (w // d) * d
    x = x[..., :hc, :wc]
    x = x.reshape(*x.shape[:-2], hc // d, d, wc // d, d)
    return x.mean(axis=(-3, -1))


@functools.partial(jax.jit, static_argnames=("window", "downscale"))
def phase_correlate_batched(
    templates: jnp.ndarray,  # [N,H,W] float32 (current frames' grey)
    input_image: jnp.ndarray,  # [H,W] float32 (reference grey)
    window: bool = True,
    downscale: int = 1,
):
    """Per-frame translation ``t`` such that
    ``templates[i](x) ≈ input_image(x + t_i)`` — i.e. the translation
    part of the ECC warp (template -> input coords).

    Returns ``(t, response)``: ``t`` is ``[N,2]`` float32 ``(tx, ty)``
    in FULL-resolution pixels, ``response`` is the normalised
    correlation peak height ``[N]`` (compare against
    :data:`_MIN_RESPONSE`).  ``downscale`` pools the grid ``d x d``
    before the FFT (bounds the complex temporaries; the recovered shift
    is scaled back up).
    """
    n = templates.shape[0]
    a = _pool(templates.astype(jnp.float32), downscale)
    b = _pool(input_image.astype(jnp.float32), downscale)
    h, w = a.shape[-2], a.shape[-1]
    if window:
        win = _hann2d(h, w)
        a = a * win
        b = b * win
    fa = jnp.fft.rfft2(a)
    fb = jnp.fft.rfft2(b)
    cross = fa * jnp.conj(fb)[None]
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    r = jnp.fft.irfft2(cross, s=(h, w))  # [N,H,W], peak at -t (wrapped)

    flat = r.reshape(n, h * w)
    idx = jnp.argmax(flat, axis=1)
    py = idx // w
    px = idx % w
    resp = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]

    def at(dy, dx):
        yy = jnp.mod(py + dy, h)
        xx = jnp.mod(px + dx, w)
        return jnp.take_along_axis(
            flat, (yy * w + xx)[:, None], axis=1
        )[:, 0]

    sub_y = _parabolic(at(-1, 0), resp, at(1, 0))
    sub_x = _parabolic(at(0, -1), resp, at(0, 1))
    # unwrap: peak position p in [0, N) encodes -t; shifts beyond half
    # the extent alias (inherent to cyclic correlation)
    fy = py.astype(jnp.float32) + sub_y
    fx = px.astype(jnp.float32) + sub_x
    ty = -jnp.where(fy > h / 2.0, fy - h, fy) * downscale
    tx = -jnp.where(fx > w / 2.0, fx - w, fx) * downscale
    return jnp.stack([tx, ty], axis=1), resp


@functools.partial(jax.jit, static_argnames=("motion_type", "window"))
def phase_init_warps(
    templates: jnp.ndarray,  # [N,H,W] float32
    input_image: jnp.ndarray,  # [H,W] float32
    motion_type: MotionType = MotionType.Affine,
    window: bool = True,
) -> jnp.ndarray:
    """Identity warps with the phase-correlation translation filled in,
    shaped for :func:`ops.ecc.find_transform_ecc_batched`'s
    ``warp_init`` ([N,2,3] or [N,3,3] for Homography).  Low-response
    lanes keep the pure identity (the solver's default start)."""
    n, h, w = templates.shape
    t, resp = phase_correlate_batched(
        templates, input_image, window=window,
        downscale=_auto_downscale(h, w),
    )
    good = (resp >= _MIN_RESPONSE) & jnp.all(jnp.isfinite(t), axis=1)
    t = jnp.where(good[:, None], t, 0.0)
    eye = ecc_ops.identity_warp(motion_type)
    init = jnp.tile(eye[None], (n, 1, 1))
    init = init.at[:, 0, 2].set(t[:, 0]).at[:, 1, 2].set(t[:, 1])
    return init
