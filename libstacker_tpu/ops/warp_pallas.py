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

Non-aligned image sizes: the source is zero-padded to (8, 128)-aligned
extents (hp, wp) before the kernel and the window origin is clipped
against the PADDED dims — the clip upper bounds (hp-wh, wp-ww) are then
themselves aligned, so the floor-quantised origin can always reach the
image's right/bottom edge.  Taps beyond the true (h, w) extent are
masked to the border value exactly as before (the validity masks use
the true dims), so the zero padding never leaks into the output.

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


def residual_domain_ok(
    m3,
    h: int,
    w: int,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    xp=jnp,
) -> jnp.ndarray:
    """Per-matrix check of the kernel's correctness domain -> [G] bool.

    The kernel tolerates a residual source displacement of at most
    ``k + 1`` pixels around each tile-centre displacement, rounded to
    the nearest integer (see module docstring).  For every output tile,
    evaluate the displacement field ``d(p) = M(p) - p`` on a 3x3 sample
    grid (centre, mid-edges, corners) and bound the in-tile spread;
    0.5 px is reserved for the centre rounding.  For an affine map the
    field is linear in the tile coordinates, so the corner samples
    attain the true in-tile maximum exactly; for a projective map the
    field additionally curves between samples, bounded ANALYTICALLY
    from the perspective row and the tile extent (rather than a fixed
    allowance): writing den(p) = D_c (1 + e(u)) about the tile centre
    with |e| <= e_m = (|m20| tw + |m21| th) / (2 |D_c|), the deviation
    of s(p) from its linearisation is at most
    ``r = e_m/(1-e_m) * R + e_m^2/(1-e_m) * S`` per axis (R = sampled
    field variation, S = sampled |s| magnitude — from the exact
    expansion 1/(1+e) = 1 - e + e^2/(1+e)), and the true spread exceeds
    the sampled spread by at most 4r.  Tiles with e_m >= 0.5 (a
    denominator pole near the tile) fail outright.  NaN/inf matrices
    fail.

    ``m3``: [G, 3, 3] INVERSE maps (what the kernel consumes).
    Traceable (pure jnp by default) so ECC can run it per iteration
    in-graph; pass ``xp=numpy`` for a pure-host check (eager jnp over
    the TPU tunnel is slow).
    """
    th, tw = tile
    ny = (h + th - 1) // th
    nx = (w + tw - 1) // tw
    # tile origins + 3x3 sample offsets (centre first)
    oy = (xp.arange(ny, dtype=xp.float32) * th)[:, None]
    ox = (xp.arange(nx, dtype=xp.float32) * tw)[None, :]
    hy, hx = th * 0.5, tw * 0.5
    offs = xp.asarray(
        [
            [hy, hx],
            [0, 0], [0, hx], [0, tw],
            [hy, 0], [hy, tw],
            [th, 0], [th, hx], [th, tw],
        ],
        xp.float32,
    )  # [9, (y,x)]
    ns = offs.shape[0]
    py = (oy + ox * 0.0)[..., None] + offs[None, None, :, 0]  # [ny,nx,9]
    px = (ox + oy * 0.0)[..., None] + offs[None, None, :, 1]
    py = py.reshape(-1)  # [T*9]
    px = px.reshape(-1)
    m = m3.astype(xp.float32)
    with _np_err_ignore(xp):
        den = m[:, 2, 0, None] * px + m[:, 2, 1, None] * py + m[:, 2, 2, None]
        inv = 1.0 / den  # propagates inf/nan on degenerate denominators
        sx = (m[:, 0, 0, None] * px + m[:, 0, 1, None] * py
              + m[:, 0, 2, None]) * inv
        sy = (m[:, 1, 0, None] * px + m[:, 1, 1, None] * py
              + m[:, 1, 2, None]) * inv
        ddx = (sx - px).reshape(-1, ny * nx, ns)  # [G, T, 9]
        ddy = (sy - py).reshape(-1, ny * nx, ns)
        spread = xp.maximum(  # [G, T] per-tile sampled spread
            xp.max(xp.abs(ddx[..., 1:] - ddx[..., :1]), axis=2),
            xp.max(xp.abs(ddy[..., 1:] - ddy[..., :1]), axis=2),
        )
        # analytic projective-curvature allowance (zero for affine maps)
        den_c = den.reshape(-1, ny * nx, ns)[..., 0]  # [G, T] tile centres
        e_m = (
            xp.abs(m[:, 2, 0, None]) * hx + xp.abs(m[:, 2, 1, None]) * hy
        ) / xp.maximum(xp.abs(den_c), xp.float32(1e-30))
        sxr = sx.reshape(-1, ny * nx, ns)
        syr = sy.reshape(-1, ny * nx, ns)
        r_fld = xp.maximum(
            xp.max(xp.abs(sxr - sxr[..., :1]), axis=2),
            xp.max(xp.abs(syr - syr[..., :1]), axis=2),
        )  # [G, T] sampled per-axis field variation
        s_abs = xp.maximum(
            xp.max(xp.abs(sxr), axis=2), xp.max(xp.abs(syr), axis=2)
        )
        denom = xp.maximum(1.0 - e_m, xp.float32(1e-6))
        curv = 4.0 * (e_m / denom * r_fld + e_m * e_m / denom * s_abs)
        # NaN spread (degenerate matrix) compares False -> out of
        # domain; the kernel band is k+1, minus 0.5 px centre rounding
        # and the per-tile analytic curvature allowance
        tile_ok = (e_m < 0.5) & (spread + curv <= xp.float32(k) + 0.5)
    return xp.all(tile_ok, axis=1)


def _np_err_ignore(xp):
    """Silence numpy divide-by-zero warnings on the host path; no-op
    context for jnp."""
    import contextlib

    import numpy as _np

    if xp is _np:
        return _np.errstate(divide="ignore", invalid="ignore")
    return contextlib.nullcontext()


def compute_window_origin(mm, ti, tj, *, th, tw, k, hp, wp):
    """Tile-centre displacement -> tiling-aligned source-window origin.

    ``mm``: 9 matrix scalars (row-major 3x3 inverse map).  Returns
    (r0, c0, r0_ideal, c0_ideal): the (8,128)-aligned DMA origin clipped
    to the padded extents, and the ideal (unaligned, unclipped) origin
    the kernel re-aligns to with dynamic rolls.  Shared by the warp and
    ECC-moments kernels."""
    cy_ = (ti * th).astype(jnp.float32) + th * 0.5
    cx_ = (tj * tw).astype(jnp.float32) + tw * 0.5
    cden = mm[6] * cx_ + mm[7] * cy_ + mm[8]
    cinv = jnp.where(cden != 0.0, 1.0 / cden, 0.0)
    csx = (mm[0] * cx_ + mm[1] * cy_ + mm[2]) * cinv
    csy = (mm[3] * cx_ + mm[4] * cy_ + mm[5]) * cinv
    by_ = jnp.round(csy - cy_).astype(jnp.int32)
    bx_ = jnp.round(csx - cx_).astype(jnp.int32)
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    r0i = ti * th + by_ - (k + 1)
    c0i = tj * tw + bx_ - (k + 1)
    r0 = (jnp.clip(r0i, 0, hp - wh) // 8) * 8
    c0 = (jnp.clip(c0i, 0, wp - ww) // 128) * 128
    return r0, c0, r0i, c0i


def compute_source_coords(m, y0, x0, *, th, tw, quant_affine):
    """Inverse-map the tile's output pixels to source coordinates with
    OpenCV's 1/32-px quantisation.

    ``m``: 9 matrix scalars.  Returns (sx, sy, fx0, fy0, fx, fy):
    unquantised coords, integer tap-0 coords (as f32) and fractional
    weights — all [th, tw] f32.  Shared by the warp and ECC-moments
    kernels (and the latter reuses sx/sy as OpenCV's hatX/hatY Jacobian
    fields)."""
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
    return sx, sy, fx0, fy0, fx, fy


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
    hp: int,
    wp: int,
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
        grid step (g_, ti_, tj_).  Clipped against the PADDED source
        dims (hp, wp): their alignment makes the clip bounds floor-exact
        so the window always reaches the image edge."""
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
        r0_ = (jnp.clip(r0i, 0, hp - wh) // 8) * 8
        c0_ = (jnp.clip(c0i, 0, wp - ww) // 128) * 128
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
    static_argnames=(
        "k", "tile", "quant_affine", "interpret", "true_hw", "out_hw"
    ),
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
    true_hw: Optional[Tuple[int, int]] = None,
    out_hw: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Warp a batch of images with per-image 3x3 matrices (inverse-map
    semantics: dst(x,y) = src(M @ (x,y,1)), BORDER_CONSTANT).

    ``src``: [S, H, W] float32; ``m3``: [G, 3, 3]; returns
    [G, *out_hw] (``out_hw`` defaults to the source extent — pass it
    when the output grid differs from the source, e.g. the non-constant
    border modes in ops.warp_batch warp an apron-extended source onto
    the original grid).  ``src_index`` ([G] int32, default arange) maps
    each output slot to a source image — lets B frame-lanes warp the
    same S shared sources (ECC warps image+gx+gy per lane) without
    duplicating HBM reads.  Non-(8,128)-aligned sizes are zero-padded
    internally; callers in hot loops can pre-pad once and pass the real
    extent via ``true_hw``.
    """
    s_n, h_in, w_in = src.shape
    if true_hw is not None:
        h, w = true_hw
        if h_in % 8 != 0 or w_in % 128 != 0 or h_in < h or w_in < w:
            raise ValueError(
                f"pre-padded src {h_in}x{w_in} must be (8,128)-aligned and "
                f"cover true_hw {true_hw}"
            )
        hp, wp = h_in, w_in
    else:
        h, w = h_in, w_in
        hp, wp = _round_up(h, 8), _round_up(w, 128)
        if (hp, wp) != (h, w):
            src = jnp.pad(src, ((0, 0), (0, hp - h), (0, wp - w)))
    oh, ow = out_hw if out_hw is not None else (h, w)
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
    if hp < wh or wp < ww:
        raise ValueError(
            f"image {h}x{w} too small for pallas warp window {wh}x{ww}; "
            "use ops.warp instead"
        )
    grid = (g, pl.cdiv(oh, th), pl.cdiv(ow, tw))
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

    ny, nx = pl.cdiv(oh, th), pl.cdiv(ow, tw)
    kernel = functools.partial(
        _warp_kernel, th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
        ny=ny, nx=nx, quant_affine=quant_affine,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, oh, ow), jnp.float32),
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
        # Wide-column tiles (LIBSTACKER_WARP_TILE_COLS) overflow the
        # 16MB default scoped-VMEM limit; v5e has 128MB physical.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
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
    hp: int,
    wp: int,
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
        r0_ = (jnp.clip(r0i, 0, hp - wh) // 8) * 8
        c0_ = (jnp.clip(c0i, 0, wp - ww) // 128) * 128
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
    jax.jit, static_argnames=("k", "tile", "quant_affine", "interpret",
                              "true_hw")
)
def warp3_bilinear_pallas(
    srcs: jnp.ndarray,
    m3: jnp.ndarray,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
    true_hw: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Warp the 3 shared sources with per-lane matrices in one pass:
    ``srcs`` [3,H,W] f32, ``m3`` [B,3,3] -> [B,3,H,W] (BORDER_CONSTANT 0).
    The ECC inner-loop fast path (one window origin + one weight set per
    tile instead of three).  Non-aligned sizes are zero-padded
    internally; hot loops pre-pad once and pass ``true_hw``."""
    three, h_in, w_in = srcs.shape
    assert three == 3
    if true_hw is not None:
        h, w = true_hw
        if h_in % 8 != 0 or w_in % 128 != 0 or h_in < h or w_in < w:
            raise ValueError(
                f"pre-padded srcs {h_in}x{w_in} must be (8,128)-aligned "
                f"and cover true_hw {true_hw}"
            )
        hp, wp = h_in, w_in
    else:
        h, w = h_in, w_in
        hp, wp = _round_up(h, 8), _round_up(w, 128)
        if (hp, wp) != (h, w):
            srcs = jnp.pad(srcs, ((0, 0), (0, hp - h), (0, wp - w)))
    b = m3.shape[0]
    th, tw = tile
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(f"tile {tile}: need rows % 8 == 0, cols % 128 == 0")
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    if hp < wh or wp < ww:
        raise ValueError(f"image {h}x{w} too small for window {wh}x{ww}")
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    mflat = m3.reshape(b, 9).astype(jnp.float32)
    params = jnp.concatenate([mflat, jnp.zeros((b, 3), jnp.float32)], axis=1)
    kernel = functools.partial(
        _warp3_kernel, th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
        ny=ny, nx=nx, quant_affine=quant_affine,
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(params, srcs.astype(jnp.float32))
