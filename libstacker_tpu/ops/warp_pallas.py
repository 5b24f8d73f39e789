"""Pallas TPU kernel: tiled bilinear warp for near-identity transforms.

The inverse-map bilinear warp (SURVEY.md N5/N6) is the hot op of both
alignment paths — ECC applies it ~4x per iteration.  The XLA gather
formulation costs ~500ms per 4K frame on v5e (gathers serialize); this
kernel reformulates the warp as **dense VPU work**:

- the output is tiled (grid over [G, TY, TX]);
- per tile, the mean displacement is absorbed by DMA-ing a slightly
  larger source window whose origin follows the warp (computed from the
  matrix in-kernel, scalar math);
- the *residual* per-pixel displacement within a tile is bounded by the
  in-tile variation of the warp field (rotation/scale/perspective over
  128 px — a few pixels), so bilinear sampling becomes a short static
  sum of shifted window slices weighted by per-pixel tap masks — no
  gather at all.

Correctness domain: the per-pixel source offset may deviate from the
tile-centre offset by at most ``k`` pixels — the in-tile variation of
the warp field, NOT the absolute displacement (which the window origin
absorbs).  k=7 covers rotations to ~2.5 deg and scale within ~5% on
128px tiles, far beyond burst alignment.  Out-of-domain pixels fall to
the border value; callers needing arbitrary warps use the XLA-gather
path in ops.warp.  Window margins are decoupled from k: rows
th + 2k + 10 (the +10 absorbs the floor-8 DMA-start quantisation and
the two-tap extent), columns tw + 256 (floor-128 quantisation), with
dynamic rolls re-aligning the window to its ideal origin.

OpenCV parity: source coordinates quantised exactly like ops.warp
(1/32 px bins, warpAffine's 1/1024 fixed-point variant optional), and
BORDER_CONSTANT blending matches per-tap masking semantics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _warp_kernel(
    m_ref,  # SMEM [G, 12]: 9 matrix entries + border value + src index
    src_ref,  # ANY [S, H, W]
    out_ref,  # VMEM [1, TH, TW]
    scratch,  # VMEM [2, WH, WW] (double-buffered source windows)
    sem,  # DMA semaphores [2]
    *,
    th: int,
    tw: int,
    k: int,
    h: int,
    w: int,
    ny: int,
    nx: int,
    quant_affine: bool,
):
    g = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    ng = pl.num_programs(0)
    y0 = ti * th
    x0 = tj * tw

    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256

    def window_origin(g_, ti_, tj_):
        """Tile-centre displacement -> tiling-aligned window origin for
        grid step (g_, ti_, tj_)."""
        mm = [m_ref[g_, i] for i in range(9)]
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
        r0_ = (jnp.clip(r0i, 0, max(h - wh, 0)) // 8) * 8
        c0_ = (jnp.clip(c0i, 0, max(w - ww, 0)) // 128) * 128
        sidx = m_ref[g_, 10].astype(jnp.int32)
        return sidx, r0_, c0_, r0i, c0i

    def start_dma(g_, ti_, tj_, slot):
        sidx, r0_, c0_, _, _ = window_origin(g_, ti_, tj_)
        pltpu.make_async_copy(
            src_ref.at[sidx, pl.ds(r0_, wh), pl.ds(c0_, ww)],
            scratch.at[slot],
            sem.at[slot],
        ).start()

    # --- double-buffered window pipeline across grid steps ---
    step = (g * ny + ti) * nx + tj
    total = ng * ny * nx
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_dma(g, ti, tj, slot)

    # prefetch the next grid step's window while this tile computes
    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        tj_n = jax.lax.rem(nstep, nx)
        ti_n = jax.lax.rem(nstep // nx, ny)
        g_n = nstep // (nx * ny)
        start_dma(g_n, ti_n, tj_n, jax.lax.rem(nstep, 2))

    m = [m_ref[g, i] for i in range(9)]
    border_value = m_ref[g, 9]

    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    ys = (y0 + iy).astype(jnp.float32)
    xs = (x0 + ix).astype(jnp.float32)
    den = m[6] * xs + m[7] * ys + m[8]
    inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
    sx = (m[0] * xs + m[1] * ys + m[2]) * inv
    sy = (m[3] * xs + m[4] * ys + m[5]) * inv

    # cv2-parity coordinate quantisation (1/32 px bins)
    if quant_affine:
        xq = jnp.floor((jnp.round(sx * 1024.0) + 16.0) / 32.0)
        yq = jnp.floor((jnp.round(sy * 1024.0) + 16.0) / 32.0)
    else:
        xq = jnp.round(sx * 32.0)
        yq = jnp.round(sy * 32.0)
    fx0 = jnp.floor(xq * (1.0 / 32.0))
    fy0 = jnp.floor(yq * (1.0 / 32.0))
    fx = (xq - fx0 * 32.0) * (1.0 / 32.0)
    fy = (yq - fy0 * 32.0) * (1.0 / 32.0)

    _, r0, c0, r0_ideal, c0_ideal = window_origin(g, ti, tj)
    pltpu.make_async_copy(
        src_ref.at[0, pl.ds(0, wh), pl.ds(0, ww)],  # shape-only descriptor
        scratch.at[slot],
        sem.at[slot],
    ).wait()

    # Compensate edge clamping + start quantisation with dynamic rolls so
    # the window behaves as if it started at the ideal origin (wrapped
    # entries only land on zero-weight positions — valid taps always stay
    # inside the DMA'd region by construction).
    win = scratch[slot]
    # dynamic rolls must use non-negative shifts
    win = pltpu.roll(win, jnp.mod(r0 - r0_ideal, wh), 0)
    win = pltpu.roll(win, jnp.mod(c0 - c0_ideal, ww), 1)

    sy_rel = fy0.astype(jnp.int32) - r0_ideal - iy  # window-row of tap0 - ly
    sx_rel = fx0.astype(jnp.int32) - c0_ideal - ix

    s_lo, s_hi = 0, 2 * k + 3  # resid in [-(k+1), k+1] plus the +1 tap
    t_lo, t_hi = 0, 2 * k + 3
    # out-of-image taps must not alias roll-wrapped window content
    vx0 = ((fx0 >= 0.0) & (fx0 <= w - 1.0)).astype(jnp.float32)
    vx1 = ((fx0 >= -1.0) & (fx0 <= w - 2.0)).astype(jnp.float32)
    vy0 = ((fy0 >= 0.0) & (fy0 <= h - 1.0)).astype(jnp.float32)
    vy1 = ((fy0 >= -1.0) & (fy0 <= h - 2.0)).astype(jnp.float32)
    wx_list = [
        (1.0 - fx) * vx0 * (sx_rel == t) + fx * vx1 * (sx_rel == t - 1)
        for t in range(t_lo, t_hi + 1)
    ]
    acc = jnp.zeros((th, tw), jnp.float32)
    wsum_y = jnp.zeros((th, tw), jnp.float32)
    wsum_x = jnp.zeros((th, tw), jnp.float32)
    for wx in wx_list:
        wsum_x = wsum_x + wx
    for s in range(s_lo, s_hi + 1):
        w_s = (1.0 - fy) * vy0 * (sy_rel == s) + fy * vy1 * (sy_rel == s - 1)
        wsum_y = wsum_y + w_s
        tmp = jnp.zeros((th, tw), jnp.float32)
        for ti_, wx in enumerate(wx_list):
            t = t_lo + ti_
            tmp = tmp + wx * win[s : s + th, t : t + tw]
        acc = acc + w_s * tmp
    # BORDER_CONSTANT: missing tap weight goes to the border value
    acc = acc + border_value * (1.0 - wsum_y * wsum_x)
    out_ref[0, :, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "quant_affine", "interpret"),
)
def warp_bilinear_pallas(
    src: jnp.ndarray,
    m3: jnp.ndarray,
    border_value: jnp.ndarray | float = 0.0,
    src_index: Optional[jnp.ndarray] = None,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp a batch of images with per-image 3x3 matrices (inverse-map
    semantics: dst(x,y) = src(M @ (x,y,1)), BORDER_CONSTANT).

    ``src``: [S, H, W] float32; ``m3``: [G, 3, 3]; returns [G, H, W].
    ``src_index`` ([G] int32, default arange) maps each output slot to a
    source image — lets B frame-lanes warp the same S shared sources
    (ECC warps image+gx+gy per lane) without duplicating HBM reads.
    """
    s_n, h, w = src.shape
    g = m3.shape[0]
    th, tw = tile
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    # Mosaic: output blocks need (8, 128)-divisible tile dims; the DMA
    # window is aligned by construction.
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(
            f"tile {tile}: need tile rows % 8 == 0 and tile cols % 128 == 0"
        )
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    if h < wh or w < ww:
        raise ValueError(
            f"image {h}x{w} too small for pallas warp window {wh}x{ww}; "
            "use ops.warp instead"
        )
    grid = (g, pl.cdiv(h, th), pl.cdiv(w, tw))
    mflat = m3.reshape(g, 9).astype(jnp.float32)
    bv = jnp.asarray(border_value, jnp.float32).reshape(-1)
    if bv.size == 1:
        bv = jnp.broadcast_to(bv, (g,))
    assert bv.shape == (g,), f"border_value must be scalar or [{g}]" 
    if src_index is None:
        src_index = jnp.arange(g, dtype=jnp.int32)
    params = jnp.concatenate(
        [
            mflat,
            bv[:, None],
            src_index.astype(jnp.float32)[:, None],
            jnp.zeros((g, 1), jnp.float32),
        ],
        axis=1,
    )  # [G, 12]

    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    kernel = functools.partial(
        _warp_kernel, th=th, tw=tw, k=k, h=h, w=w, ny=ny, nx=nx,
        quant_affine=quant_affine,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [G,12] param table
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw), lambda gg, i, j: (gg, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, src.astype(jnp.float32))


def _warp3_kernel(
    m_ref,  # SMEM [B, 12]
    src_ref,  # ANY [3, H, W] (shared sources: image, gx, gy)
    out_ref,  # VMEM [1, 3, TH, TW]
    scratch,  # VMEM [3, WH, WW]
    sem,  # DMA semaphores [3]
    *,
    th: int,
    tw: int,
    k: int,
    h: int,
    w: int,
    ny: int,
    nx: int,
    quant_affine: bool,
):
    """ECC fast path: per grid step, warp the 3 shared sources with one
    window origin / one weight computation — same math as _warp_kernel,
    one third of the per-tile overhead."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    nb = pl.num_programs(0)
    y0 = ti * th
    x0 = tj * tw

    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256

    def window_origin(b_, ti_, tj_):
        mm = [m_ref[b_, i] for i in range(9)]
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
        r0_ = (jnp.clip(r0i, 0, max(h - wh, 0)) // 8) * 8
        c0_ = (jnp.clip(c0i, 0, max(w - ww, 0)) // 128) * 128
        return r0_, c0_, r0i, c0i

    r0c, c0c, r0_ideal, c0_ideal = window_origin(b, ti, tj)
    copies = [
        pltpu.make_async_copy(
            src_ref.at[c, pl.ds(r0c, wh), pl.ds(c0c, ww)],
            scratch.at[c],
            sem.at[c],
        )
        for c in range(3)
    ]
    for cp in copies:
        cp.start()

    m = [m_ref[b, i] for i in range(9)]

    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    ys = (y0 + iy).astype(jnp.float32)
    xs = (x0 + ix).astype(jnp.float32)
    den = m[6] * xs + m[7] * ys + m[8]
    inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
    sx = (m[0] * xs + m[1] * ys + m[2]) * inv
    sy = (m[3] * xs + m[4] * ys + m[5]) * inv
    if quant_affine:
        xq = jnp.floor((jnp.round(sx * 1024.0) + 16.0) / 32.0)
        yq = jnp.floor((jnp.round(sy * 1024.0) + 16.0) / 32.0)
    else:
        xq = jnp.round(sx * 32.0)
        yq = jnp.round(sy * 32.0)
    fx0 = jnp.floor(xq * (1.0 / 32.0))
    fy0 = jnp.floor(yq * (1.0 / 32.0))
    fx = (xq - fx0 * 32.0) * (1.0 / 32.0)
    fy = (yq - fy0 * 32.0) * (1.0 / 32.0)

    r0, c0 = r0c, c0c
    for cp in copies:
        cp.wait()

    sy_rel = fy0.astype(jnp.int32) - r0_ideal - iy
    sx_rel = fx0.astype(jnp.int32) - c0_ideal - ix
    n_lo, n_hi = 0, 2 * k + 3
    vx0 = ((fx0 >= 0.0) & (fx0 <= w - 1.0)).astype(jnp.float32)
    vx1 = ((fx0 >= -1.0) & (fx0 <= w - 2.0)).astype(jnp.float32)
    vy0 = ((fy0 >= 0.0) & (fy0 <= h - 1.0)).astype(jnp.float32)
    vy1 = ((fy0 >= -1.0) & (fy0 <= h - 2.0)).astype(jnp.float32)
    wx_list = [
        (1.0 - fx) * vx0 * (sx_rel == t) + fx * vx1 * (sx_rel == t - 1)
        for t in range(n_lo, n_hi + 1)
    ]
    roll_r = jnp.mod(r0 - r0_ideal, wh)
    roll_c = jnp.mod(c0 - c0_ideal, ww)
    for c in range(3):
        win = scratch[c]
        win = pltpu.roll(win, roll_r, 0)
        win = pltpu.roll(win, roll_c, 1)
        acc = jnp.zeros((th, tw), jnp.float32)
        for ss in range(n_lo, n_hi + 1):
            w_s = (
                (1.0 - fy) * vy0 * (sy_rel == ss)
                + fy * vy1 * (sy_rel == ss - 1)
            )
            tmp = jnp.zeros((th, tw), jnp.float32)
            for ci, wx in enumerate(wx_list):
                t = n_lo + ci
                tmp = tmp + wx * win[ss : ss + th, t : t + tw]
            acc = acc + w_s * tmp
        out_ref[0, c, :, :] = acc


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "quant_affine", "interpret")
)
def warp3_bilinear_pallas(
    srcs: jnp.ndarray,
    m3: jnp.ndarray,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp the 3 shared sources with per-lane matrices in one pass:
    ``srcs`` [3,H,W] f32, ``m3`` [B,3,3] -> [B,3,H,W] (BORDER_CONSTANT 0).
    The ECC inner-loop fast path (one window origin + one weight set per
    tile instead of three)."""
    three, h, w = srcs.shape
    assert three == 3
    b = m3.shape[0]
    th, tw = tile
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(f"tile {tile}: need rows % 8 == 0, cols % 128 == 0")
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    if h < wh or w < ww:
        raise ValueError(f"image {h}x{w} too small for window {wh}x{ww}")
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    mflat = m3.reshape(b, 9).astype(jnp.float32)
    params = jnp.concatenate([mflat, jnp.zeros((b, 3), jnp.float32)], axis=1)
    kernel = functools.partial(
        _warp3_kernel, th=th, tw=tw, k=k, h=h, w=w, ny=ny, nx=nx,
        quant_affine=quant_affine,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        grid=(b, ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, th, tw), lambda bb, i, j: (bb, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(params, srcs.astype(jnp.float32))
