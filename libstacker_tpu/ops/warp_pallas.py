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
tile-center offset by at most ``k`` pixels (covers rotations up to
~2-3 deg and scale within ~5% for 128px tiles — far beyond what burst
alignment produces).  Out-of-domain pixels fall to the border value;
callers needing arbitrary warps use the XLA-gather path in ops.warp.

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
    m_ref,  # SMEM [1, 12]: 9 matrix entries + border value
    src_ref,  # ANY [G, H, W]
    out_ref,  # VMEM [1, TH, TW]
    scratch,  # VMEM [WH, WW_alloc]
    sem,
    *,
    th: int,
    tw: int,
    k: int,
    h: int,
    w: int,
    quant_affine: bool,
):
    g = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    y0 = ti * th
    x0 = tj * tw

    m = [m_ref[g, i] for i in range(9)]
    border_value = m_ref[g, 9]
    src_idx = m_ref[g, 10].astype(jnp.int32)  # shared-source indirection

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

    # tile-centre displacement -> source window origin (scalar math)
    cy = jnp.float32(y0) + th * 0.5
    cx = jnp.float32(x0) + tw * 0.5
    cden = m[6] * cx + m[7] * cy + m[8]
    cinv = jnp.where(cden != 0.0, 1.0 / cden, 0.0)
    csx = (m[0] * cx + m[1] * cy + m[2]) * cinv
    csy = (m[3] * cx + m[4] * cy + m[5]) * cinv
    by = jnp.round(csy - cy).astype(jnp.int32)
    bx = jnp.round(csx - cx).astype(jnp.int32)

    wh = th + 4 * k + 4  # rows window (multiple of 8 for k=7, th=128)
    ww = tw + 256  # cols window (multiple of 128)
    r0_ideal = y0 + by - (2 * k + 2)
    c0_ideal = x0 + bx - 96
    # DMA start offsets must land on the (8, 128) tiling; the rolls below
    # compensate, and the window margins absorb the quantisation.
    r0 = (jnp.clip(r0_ideal, 0, max(h - wh, 0)) // 8) * 8
    c0 = (jnp.clip(c0_ideal, 0, max(w - ww, 0)) // 128) * 128

    cp = pltpu.make_async_copy(
        src_ref.at[src_idx, pl.ds(r0, wh), pl.ds(c0, ww)],
        scratch,
        sem,
    )
    cp.start()
    cp.wait()

    # Compensate edge clamping with dynamic rolls so the window behaves
    # as if it started at the ideal origin (wrapped entries only land on
    # zero-weight positions — valid taps always stay inside the DMA'd
    # region by construction of the clamp).
    win = scratch[:, :]
    # dynamic rolls must use non-negative shifts
    win = pltpu.roll(win, jnp.mod(r0 - r0_ideal, wh), 0)
    win = pltpu.roll(win, jnp.mod(c0 - c0_ideal, ww), 1)

    sy_rel = fy0.astype(jnp.int32) - r0_ideal - iy  # window-row of tap0 - ly
    sx_rel = fx0.astype(jnp.int32) - c0_ideal - ix

    s_lo, s_hi = k + 1, 3 * k + 4  # tap rows live in [2k+2 - (k+1), 2k+2 + (k+2)]
    t_lo, t_hi = 96 - (k + 1), 96 + (k + 2)
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
    wh = th + 4 * k + 4
    ww = tw + 256
    # Mosaic DMA slice shapes must align to the (8, 128) tiling; the
    # output block needs (8, 128)-divisible tile dims.
    if wh % 8 != 0 or tw % 128 != 0 or th % 8 != 0:
        raise ValueError(
            f"tile {tile} with k={k} gives window rows {wh}; need "
            "window rows % 8 == 0, tile rows % 8 == 0, tile cols % 128 == 0"
        )
    if 4 * k + 5 > 128 - 1:
        raise ValueError(f"k={k} too large for the 128-column slack band")
    if k < 6:
        # the DMA row-start is floor-8 quantised; margins only cover all
        # valid taps when k+1 >= 7 (see coverage analysis in the header)
        raise ValueError(f"k={k} < 6 breaks tap coverage at image edges")
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

    kernel = functools.partial(
        _warp_kernel, th=th, tw=tw, k=k, h=h, w=w, quant_affine=quant_affine
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
            pltpu.VMEM((wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(params, src.astype(jnp.float32))
