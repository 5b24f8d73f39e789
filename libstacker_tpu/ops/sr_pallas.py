"""Pallas TPU kernel: fused nearest-tap super-resolution deposit.

ops/stack.super_res_stack (beyond-reference; the reference can only
average at input resolution, src/lib.rs:306-343) deposits every frame's
NEAREST sample onto a ``factor``-times-finer grid with Gaussian
sub-pixel weights.  The XLA formulation gathers over the full fine
grid ([fH, fW] per frame); this kernel makes the deposit window-local:

- **phase decomposition**: fine pixel (Y, X) = (f*i + py, f*j + px)
  maps through the fine->LR centre alignment to LR coordinate
  (i, j) + c_p with c_p = ((p + 0.5)/f - 0.5) per axis — so each of
  the f^2 output PHASES is a plain source-resolution warp whose
  matrix is ``minv @ T(c_px, c_py)``, with exactly the warp kernel's
  residual-band geometry (the phase shift is sub-pixel).  The caller
  runs one kernel sweep per phase (same compiled program — the matrix
  is runtime data) and lane-interleaves the phases into the fine grid;
- **nearest taps**: one one-hot tap per output pixel (rounded source
  coordinate) instead of the bilinear pair — the tap loop carries the
  Gaussian weight, and acc_v / acc_w accumulate across frames in VMEM
  like ops/warp_accum_pallas (no [N, fH, fW, 3] intermediate, no
  full-fine-grid gathers);
- **channel-interleaved windows** shared across a pixel's 3 lanes,
  identical to ops/warp_accum_pallas.

Coordinates are UNQUANTISED (SR is this framework's own semantics, not
an OpenCV-parity path).  The correctness domain is the warp kernel's
residual band evaluated on the phase matrices — the caller gates with
ops/warp_batch.pallas_pick_config on the forward phase maps
``T(-c) @ mats``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sr_kernel(
    m_ref,  # SMEM [N, 12]: 9 inverse phase-matrix entries + valid + pad
    src_ref,  # ANY [N, HP, 3*WP] f32 (interleaved channels)
    av_ref,  # VMEM [1, TH, 3*TW] — weighted value sum, revisited over n
    aw_ref,  # VMEM [1, TH, 3*TW] — weight sum (equal across channels)
    scratch,  # VMEM [2, WH, 3*WW]
    sem,  # DMA semaphores [2]
    *,
    th: int,
    tw: int,
    k: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    ny: int,
    nx: int,
    nf: int,
    perspective: bool,
    inv_two_sigma_sq: float,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n = pl.program_id(2)
    y0 = ti * th
    x0 = tj * tw

    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256  # pixel columns; interleaved width is 3*ww

    def window_origin(n_, ti_, tj_):
        """Pixel-space clip-floor origin (ops/warp_pallas scheme)."""
        mm = [m_ref[n_, i] for i in range(9)]
        cy_ = (ti_ * th).astype(jnp.float32) + th * 0.5
        cx_ = (tj_ * tw).astype(jnp.float32) + tw * 0.5
        cden = mm[6] * cx_ + mm[7] * cy_ + mm[8]
        cinv = jnp.where(cden != 0.0, 1.0 / cden, 0.0)
        csx = (mm[0] * cx_ + mm[1] * cy_ + mm[2]) * cinv
        csy = (mm[3] * cx_ + mm[4] * cy_ + mm[5]) * cinv
        by_ = jnp.round(csy - cy_).astype(jnp.int32)
        bx_ = jnp.round(csx - cx_).astype(jnp.int32)
        r0i = ti_ * th + by_ - (k + 1)
        c0i = tj_ * tw + bx_ - (k + 1)
        r0_ = (jnp.clip(r0i, 0, hp - wh) // 8) * 8
        c0_ = (jnp.clip(c0i, 0, wp - ww) // 128) * 128
        return r0_, c0_, r0i, c0i

    def start_dma(n_, ti_, tj_, slot):
        r0_, c0_, _, _ = window_origin(n_, ti_, tj_)
        pltpu.make_async_copy(
            src_ref.at[n_, pl.ds(r0_, wh), pl.ds(3 * c0_, 3 * ww)],
            scratch.at[slot],
            sem.at[slot],
        ).start()

    step = (ti * nx + tj) * nf + n
    total = ny * nx * nf
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_dma(n, ti, tj, slot)

    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        n_n = jax.lax.rem(nstep, nf)
        tj_n = jax.lax.rem(nstep // nf, nx)
        ti_n = nstep // (nf * nx)
        start_dma(n_n, ti_n, tj_n, jax.lax.rem(nstep, 2))

    m = [m_ref[n, i] for i in range(9)]
    valid_f = m_ref[n, 9]

    iy = jax.lax.broadcasted_iota(jnp.int32, (th, 3 * tw), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (th, 3 * tw), 1)
    ix = il // 3
    ys = (y0 + iy).astype(jnp.float32)
    xs = (x0 + ix).astype(jnp.float32)
    if perspective:
        den = m[6] * xs + m[7] * ys + m[8]
        # same guarded reciprocal as ops/stack._sr_chunk
        inv = 1.0 / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
        sx = (m[0] * xs + m[1] * ys + m[2]) * inv
        sy = (m[3] * xs + m[4] * ys + m[5]) * inv
    else:
        sx = m[0] * xs + m[1] * ys + m[2]
        sy = m[3] * xs + m[4] * ys + m[5]
    qx = jnp.round(sx)
    qy = jnp.round(sy)
    d2 = (sy - qy) * (sy - qy) + (sx - qx) * (sx - qx)
    inside = (qy >= 0.0) & (qy <= h - 1.0) & (qx >= 0.0) & (qx <= w - 1.0)
    if perspective:
        inside = inside & (den > 1e-6)
    wgt = jnp.where(
        inside, jnp.exp(-d2 * inv_two_sigma_sq) * valid_f, 0.0
    )

    r0, c0, r0_ideal, c0_ideal = window_origin(n, ti, tj)
    pltpu.make_async_copy(
        src_ref.at[0, pl.ds(0, wh), pl.ds(0, 3 * ww)],  # shape-only
        scratch.at[slot],
        sem.at[slot],
    ).wait()
    win = scratch[slot]
    win = pltpu.roll(win, jnp.mod(r0 - r0_ideal, wh), 0)
    win = pltpu.roll(win, jnp.mod(3 * (c0 - c0_ideal), 3 * ww), 1)

    sy_rel = qy.astype(jnp.int32) - r0_ideal - iy
    sx_rel = qx.astype(jnp.int32) - c0_ideal - ix

    # the rounded coordinate lands within [0, 2k+4] of the ideal window
    # origin (the bilinear band's floor taps span [0, 2k+3]; rounding
    # up adds one)
    lo, hi = 0, 2 * k + 4
    wx_list = [
        (sx_rel == t).astype(jnp.float32) for t in range(lo, hi + 1)
    ]
    acc = jnp.zeros((th, 3 * tw), jnp.float32)
    for s in range(lo, hi + 1):
        wy = (sy_rel == s).astype(jnp.float32)
        tmp = jnp.zeros((th, 3 * tw), jnp.float32)
        for ci, wx in enumerate(wx_list):
            t = lo + ci
            tmp = tmp + wx * win[s : s + th, 3 * t : 3 * t + 3 * tw]
        acc = acc + wy * tmp
    av = wgt * acc

    @pl.when(n == 0)
    def _():
        av_ref[0, :, :] = av
        aw_ref[0, :, :] = wgt

    @pl.when(n > 0)
    def _():
        av_ref[0, :, :] = av_ref[0, :, :] + av
        aw_ref[0, :, :] = aw_ref[0, :, :] + wgt


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sigma", "k", "tile", "perspective", "interpret"
    ),
)
def sr_deposit_pallas(
    frames: jnp.ndarray,  # [N, H, W, 3] float32
    minv_phase: jnp.ndarray,  # [N, 3, 3] INVERSE phase maps (LR grid)
    valid: jnp.ndarray,  # [N] bool/float
    kernel_sigma: float = 0.3,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    perspective: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One phase's deposit: returns (acc_v, acc_w) each [H, W, 3] f32
    (acc_w's channels are identical).  ``minv_phase`` maps the phase's
    LR output grid to source coordinates (``minv @ T(c_px, c_py)``)."""
    n, h, w, c = frames.shape
    assert c == 3, frames.shape
    th, tw = tile
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(f"tile {tile}: need rows % 8 == 0, cols % 128 == 0")
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    if not kernel_sigma > 0.0:
        raise ValueError(f"kernel_sigma must be > 0, got {kernel_sigma}")
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    if hp < wh or wp < ww:
        raise ValueError(
            f"image {h}x{w} too small for SR window {wh}x{ww}; "
            "use ops.stack's XLA path instead"
        )
    src = frames.reshape(n, h, 3 * w)
    if (hp, wp) != (h, w):
        src = jnp.pad(src, ((0, 0), (0, hp - h), (0, 3 * (wp - w))))
    params = jnp.concatenate(
        [
            minv_phase.reshape(n, 9).astype(jnp.float32),
            valid.astype(jnp.float32)[:, None],
            jnp.zeros((n, 2), jnp.float32),
        ],
        axis=1,
    )
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    kernel = functools.partial(
        _sr_kernel, th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
        ny=ny, nx=nx, nf=n, perspective=perspective,
        inv_two_sigma_sq=float(1.0 / (2.0 * kernel_sigma * kernel_sigma)),
    )
    out_tile = pl.BlockSpec(
        (1, th, 3 * tw), lambda i, j, nn: (0, i, j),
        memory_space=pltpu.VMEM,
    )
    one_shape = jax.ShapeDtypeStruct((1, h, 3 * w), jnp.float32)
    av, aw = pl.pallas_call(
        kernel,
        out_shape=(one_shape, one_shape),
        grid=(ny, nx, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(out_tile, out_tile),
        scratch_shapes=[
            pltpu.VMEM((2, wh, 3 * ww), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(params, src)
    return av[0].reshape(h, w, 3), aw[0].reshape(h, w, 3)


def phase_offsets(factor: int):
    """Per-axis sub-pixel phase centres c_p = (p + 0.5)/factor - 0.5."""
    return [(p + 0.5) / factor - 0.5 for p in range(factor)]


def phase_shift_matrix(c_px: float, c_py: float):
    """T(c): LR phase-grid coordinate -> fine-grid LR coordinate."""
    import numpy as np

    t = np.eye(3, dtype=np.float64)
    t[0, 2] = c_px
    t[1, 2] = c_py
    return t
