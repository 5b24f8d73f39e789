"""Pallas TPU kernel: fused RGB warp + masked stack accumulation.

Stage 3 of both pipelines (ref src/lib.rs:291-316, 780-814) is
"perspective-warp every frame onto frame 0's grid, then masked-sum over
frames".  Built from ops/warp_pallas plus three fusions:

- **channel-interleaved windows**: the burst stays ``[N, H, W, 3]``
  (viewed as ``[N, H, 3W]``) — no channels-first transpose, and because
  the 3 channels of a pixel are adjacent lanes, ONE weight computation
  and ONE tap multiply-add cover all three channels (the per-lane pixel
  coordinate is ``lane // 3``), cutting the O((2k+4)^2) tap loop to a
  third of three per-channel warps;
- **in-VMEM accumulation**: the grid is (tile_rows, tile_cols, frame)
  with the frame axis innermost and an output index map constant in it,
  so each output tile accumulates across all frames in VMEM and is
  flushed to HBM exactly once — the ``[N, H, W, 3]`` warped
  intermediate and the separate masked-sum pass disappear;
- **per-frame validity**: dropped lanes multiply their contribution by
  0 (the deterministic drop semantics of SURVEY.md §3.1).

Geometry notes: window columns are measured in interleaved units
(3 per pixel).  A pixel-column origin quantised to 128 px makes the
interleaved origin ``3*c0`` a multiple of 384 — itself 128-aligned —
so the DMA clip-floor-roll scheme of ops/warp_pallas carries over with
every shift a multiple of 3 (channel phase preserved).

Correctness domain and OpenCV parity (1/32-px quantisation,
BORDER_CONSTANT tap masking) are identical to ops/warp_pallas —
callers gate with the same residual_domain_ok checks.
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


def _warp_accum_kernel(
    *refs,
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
    quant_affine: bool,
    moments: bool = False,
    clip: bool = False,
    src_scale: float = 0.0,
    row_align: int = 8,
):
    # ref layout (moments/clip extend the plain accumulate kernel):
    #   m_ref    SMEM [N, 12]: 9 inverse-matrix entries + valid + 2 pad
    #   bv_ref   SMEM [3]: per-channel border value (unused in moments
    #            mode — covered samples never touch the border term)
    #   src_ref  ANY [N, HP, 3*WP] f32 (interleaved channels)
    #   mu/tol   VMEM [TH, 3*TW] (clip mode only): per-lane clip centre
    #            and tolerance, resident across the frame axis
    #   outputs  VMEM [1, TH, 3*TW] — revisited across the frame axis:
    #            plain: warped masked sum; moments: S0/S1/S2
    #   scratch  VMEM [2, WH, 3*WW] + DMA semaphores [2]
    if clip:
        (m_ref, bv_ref, src_ref, mu_ref, tol_ref,
         s0_ref, s1_ref, s2_ref, scratch, sem) = refs
    elif moments:
        (m_ref, bv_ref, src_ref,
         s0_ref, s1_ref, s2_ref, scratch, sem) = refs
    else:
        m_ref, bv_ref, src_ref, out_ref, scratch, sem = refs
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    n = pl.program_id(2)
    y0 = ti * th
    x0 = tj * tw

    # Integer sources DMA raw u8/u16 windows (4x / 2x less HBM traffic
    # than the materialised f32 burst) and convert+scale in-VMEM; their
    # coarser sublane tiling forces row starts to multiples of
    # ``row_align`` (u8: 32, u16: 16, f32: 8 — the empirical Mosaic DMA
    # alignment rule), so the window carries row_align-1 rows of
    # clip-floor slack instead of 7.
    wh = _round_up(th + 2 * k + 3 + row_align - 1, row_align)
    ww = tw + 256  # pixel columns; interleaved width is 3*ww

    def window_origin(n_, ti_, tj_):
        """Pixel-space clip-floor origin (ops/warp_pallas scheme); the
        interleaved DMA uses (r0, 3*c0)."""
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
        r0_ = (jnp.clip(r0i, 0, hp - wh) // row_align) * row_align
        c0_ = (jnp.clip(c0i, 0, wp - ww) // 128) * 128
        return r0_, c0_, r0i, c0i

    def start_dma(n_, ti_, tj_, slot):
        r0_, c0_, _, _ = window_origin(n_, ti_, tj_)
        pltpu.make_async_copy(
            src_ref.at[n_, pl.ds(r0_, wh), pl.ds(3 * c0_, 3 * ww)],
            scratch.at[slot],
            sem.at[slot],
        ).start()

    # double-buffered window pipeline across grid steps (frame axis is
    # innermost, so consecutive steps usually prefetch the NEXT frame's
    # window of the same tile)
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

    # per-LANE pixel coordinates: lane l of the interleaved tile is
    # channel l % 3 of pixel column x0 + l // 3.  (Computing weights at
    # pixel granularity and expanding with pltpu.repeat does NOT work:
    # repeat concatenates whole-array copies, not per-element runs.)
    iy = jax.lax.broadcasted_iota(jnp.int32, (th, 3 * tw), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (th, 3 * tw), 1)
    ix = il // 3
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

    r0, c0, r0_ideal, c0_ideal = window_origin(n, ti, tj)
    pltpu.make_async_copy(
        src_ref.at[0, pl.ds(0, wh), pl.ds(0, 3 * ww)],  # shape-only
        scratch.at[slot],
        sem.at[slot],
    ).wait()
    win = scratch[slot]
    if src_scale:
        # integer source: widen + normalise ONCE per window — the tap
        # loop then runs the identical f32 math as the f32-source path
        # (exact-integer convert * scale is exactly to_unit_f32's
        # value, so results stay bitwise identical).  Mosaic has no
        # direct u8->f32 cast; hop through int32 (zero-extend, exact).
        win = (
            win.astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(src_scale)
        )
    win = pltpu.roll(win, jnp.mod(r0 - r0_ideal, wh), 0)
    win = pltpu.roll(win, jnp.mod(3 * (c0 - c0_ideal), 3 * ww), 1)

    sy_rel = fy0.astype(jnp.int32) - r0_ideal - iy
    sx_rel = fx0.astype(jnp.int32) - c0_ideal - ix

    lo, hi = 0, 2 * k + 3
    vx0 = ((fx0 >= 0.0) & (fx0 <= w - 1.0)).astype(jnp.float32)
    vx1 = ((fx0 >= -1.0) & (fx0 <= w - 2.0)).astype(jnp.float32)
    vy0 = ((fy0 >= 0.0) & (fy0 <= h - 1.0)).astype(jnp.float32)
    vy1 = ((fy0 >= -1.0) & (fy0 <= h - 2.0)).astype(jnp.float32)
    wx_list = [
        (1.0 - fx) * vx0 * (sx_rel == t) + fx * vx1 * (sx_rel == t - 1)
        for t in range(lo, hi + 1)
    ]
    acc = jnp.zeros((th, 3 * tw), jnp.float32)
    wsum_y = jnp.zeros((th, 3 * tw), jnp.float32)
    wsum_x = jnp.zeros((th, 3 * tw), jnp.float32)
    for wx in wx_list:
        wsum_x = wsum_x + wx
    for s in range(lo, hi + 1):
        w_s = (1.0 - fy) * vy0 * (sy_rel == s) + fy * vy1 * (sy_rel == s - 1)
        wsum_y = wsum_y + w_s
        tmp = jnp.zeros((th, 3 * tw), jnp.float32)
        for ci, wx in enumerate(wx_list):
            t = lo + ci
            tmp = tmp + wx * win[s : s + th, 3 * t : 3 * t + 3 * tw]
        acc = acc + w_s * tmp
    if moments or clip:
        # Per-pixel COVERAGE from the UNQUANTISED source coordinates
        # (same float expressions as ops/stack._coverage): a sample
        # counts only where every nonzero-weight tap is interior, so
        # `acc` alone IS the warped value there (wsum == 1, no border
        # term).  Sample mask = coverage AND lane validity AND (clip
        # mode) |v - mu| <= tol per lane.
        cov = (
            (sx >= 0.0) & (sx <= w - 1.0) & (sy >= 0.0) & (sy <= h - 1.0)
        )
        if not quant_affine:
            cov = cov & (den > 1e-6)
        mfl = cov.astype(jnp.float32) * valid_f
        if clip:
            mfl = mfl * (
                jnp.abs(acc - mu_ref[:, :]) <= tol_ref[:, :]
            ).astype(jnp.float32)
        c1 = mfl * acc

        @pl.when(n == 0)
        def _():
            s0_ref[0, :, :] = mfl
            s1_ref[0, :, :] = c1
            s2_ref[0, :, :] = c1 * acc

        @pl.when(n > 0)
        def _():
            s0_ref[0, :, :] = s0_ref[0, :, :] + mfl
            s1_ref[0, :, :] = s1_ref[0, :, :] + c1
            s2_ref[0, :, :] = s2_ref[0, :, :] + c1 * acc

        return

    # BORDER_CONSTANT: missing tap weight goes to the per-channel value
    bv_lane = jnp.where(
        il % 3 == 0, bv_ref[0], jnp.where(il % 3 == 1, bv_ref[1], bv_ref[2])
    )
    acc = acc + bv_lane * (1.0 - wsum_y * wsum_x)
    contrib = acc * valid_f

    @pl.when(n == 0)
    def _():
        out_ref[0, :, :] = contrib

    @pl.when(n > 0)
    def _():
        out_ref[0, :, :] = out_ref[0, :, :] + contrib


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "quant_affine", "interpret")
)
def warp_accum_rgb_pallas(
    frames: jnp.ndarray,  # [N, H, W, 3] float32
    minv: jnp.ndarray,  # [N, 3, 3] INVERSE maps
    valid: jnp.ndarray,  # [N] bool/float — dropped lanes contribute 0
    border_value=0.0,  # scalar or [3]
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``sum_n valid[n] * warp(frames[n], minv[n])`` -> [H, W, 3]
    f32 (BORDER_CONSTANT).  Bit-identical per-lane math to
    ops/warp_pallas.warp_bilinear_pallas; see module docstring."""
    out = _launch(
        frames, minv, valid, border_value, k, tile, quant_affine,
        interpret, mu=None, tol=None, moments=False,
    )
    h, w = frames.shape[1], frames.shape[2]
    return out[0].reshape(h, w, 3)


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "quant_affine", "interpret")
)
def warp_moments_rgb_pallas(
    frames: jnp.ndarray,  # [N, H, W, 3] float32
    minv: jnp.ndarray,  # [N, 3, 3] INVERSE maps
    valid: jnp.ndarray,  # [N] bool/float
    mu: Optional[jnp.ndarray] = None,  # [H, W, 3] clip centre
    tol: Optional[jnp.ndarray] = None,  # [H, W, 3] clip tolerance
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused per-pixel MOMENTS of the warped burst for kappa-sigma
    stacking (ops/stack): one sweep returns

      S0 = sum_n m_n,  S1 = sum_n m_n * v_n,  S2 = sum_n m_n * v_n^2

    each [H, W, 3] f32, where ``v_n`` is the warped value (identical
    tap math to :func:`warp_accum_rgb_pallas`) and ``m_n`` is coverage
    (every contributing tap interior — same unquantised-coordinate
    test as ops/stack._coverage) AND lane validity AND, when
    ``mu``/``tol`` are given, the per-lane clip test |v - mu| <= tol.
    S0's channels are identical in the non-clip pass (coverage is
    per-pixel).  Replaces the unfused re-warp sweeps that materialise
    each chunk's [C, H, W, 3] warped intermediate."""
    if (mu is None) != (tol is None):
        raise ValueError("mu and tol must be given together")
    h, w = frames.shape[1], frames.shape[2]
    s0, s1, s2 = _launch(
        frames, minv, valid, 0.0, k, tile, quant_affine, interpret,
        mu=mu, tol=tol, moments=True,
    )
    return (
        s0[0].reshape(h, w, 3),
        s1[0].reshape(h, w, 3),
        s2[0].reshape(h, w, 3),
    )


def _launch(
    frames, minv, valid, border_value, k, tile, quant_affine, interpret,
    mu, tol, moments,
):
    n, h, w, c = frames.shape
    assert c == 3, frames.shape
    th, tw = tile
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(f"tile {tile}: need rows % 8 == 0, cols % 128 == 0")
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    # integer sources ride the kernel raw (4x/2x less window traffic);
    # their coarser sublane tiling needs coarser row alignment
    if frames.dtype == jnp.uint8:
        src_scale, row_align = 1.0 / 255.0, 32
    elif frames.dtype == jnp.uint16:
        src_scale, row_align = 1.0 / 65535.0, 16
    else:
        src_scale, row_align = 0.0, 8
    hp = _round_up(h, row_align)
    wp = _round_up(w, 128)
    wh = _round_up(th + 2 * k + 3 + row_align - 1, row_align)
    ww = tw + 256
    if hp < wh or wp < ww:
        raise ValueError(
            f"image {h}x{w} too small for warp-accum window {wh}x{ww}; "
            "use ops.warp_batch's unfused path instead"
        )
    src = frames.reshape(n, h, 3 * w)
    if (hp, wp) != (h, w):
        src = jnp.pad(src, ((0, 0), (0, hp - h), (0, 3 * (wp - w))))
    mflat = minv.reshape(n, 9).astype(jnp.float32)
    params = jnp.concatenate(
        [
            mflat,
            valid.astype(jnp.float32)[:, None],
            jnp.zeros((n, 2), jnp.float32),
        ],
        axis=1,
    )
    bv = jnp.broadcast_to(
        jnp.asarray(border_value, jnp.float32).reshape(-1), (3,)
    )
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    clip = moments and mu is not None
    kernel = functools.partial(
        _warp_accum_kernel, th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
        ny=ny, nx=nx, nf=n, quant_affine=quant_affine,
        moments=moments, clip=clip, src_scale=src_scale,
        row_align=row_align,
    )
    out_tile = pl.BlockSpec(
        (1, th, 3 * tw), lambda i, j, nn: (0, i, j),
        memory_space=pltpu.VMEM,
    )
    one_shape = jax.ShapeDtypeStruct((1, h, 3 * w), jnp.float32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [params, bv, src]
    if clip:
        # clip-centre/tolerance tiles: index map constant in the frame
        # axis, so they stay VMEM-resident across the whole burst
        lane_tile = pl.BlockSpec(
            (th, 3 * tw), lambda i, j, nn: (i, j),
            memory_space=pltpu.VMEM,
        )
        in_specs += [lane_tile, lane_tile]
        operands += [mu.reshape(h, 3 * w), tol.reshape(h, 3 * w)]
    return pl.pallas_call(
        kernel,
        out_shape=(one_shape,) * 3 if moments else one_shape,
        grid=(ny, nx, n),
        in_specs=in_specs,
        out_specs=(out_tile,) * 3 if moments else out_tile,
        scratch_shapes=[
            pltpu.VMEM((2, wh, 3 * ww), frames.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # Wide-column tiles (LIBSTACKER_WARP_TILE_COLS) overflow the
        # 16MB default scoped-VMEM limit; v5e has 128MB physical.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
