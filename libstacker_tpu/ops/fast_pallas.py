"""Pallas TPU kernel: one-pass FAST-9/16 corner detection + NMS.

The dense XLA formulation in ops/fast.py is correct but multi-pass —
the 16 circle slices, the ~64-op arc min/max tree and the NMS each
re-touch HBM-sized intermediates, costing ~5 ms/frame at 4K on v5e
(the last plain-XLA hot stage of the keypoint path, r2 VERDICT item 1).
This kernel computes the whole thing — segment test, cornerScore, 3x3
non-max suppression, interior/edge-threshold masking — in ONE sweep:

- grid over (frame, tile-rows, tile-cols), tiles of (128, 128);
- per tile, a (144, 384) source window is DMA'd into VMEM (static
  origin: the image is pre-padded by 8 rows top / 128 cols left plus
  aligned bottom/right slack, so every tile's halo window starts at an
  (8, 128)-aligned offset with no dynamic rolls);
- the FAST circle taps are static slices of the window, the arc tree
  is the same list-rotation log-doubling as ops/fast.py, and NMS
  compares the tile's scores against the 1-px-halo scores computed in
  the same pass;
- output is the NMS'd score map (score > 0 <=> kept corner, since
  cornerScore >= threshold > 1), masked to the interior and to ORB's
  ``edge_threshold`` band — the caller goes straight to top-k.

Semantics identical to ops/fast.py::fast_detect (itself matched to
OpenCV FAST type 9_16 with nonmaxSuppression, SURVEY.md N4; reference
call site src/utils.rs:174-183) plus the fused border mask of
models/keypoint's detection stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS

_TH = 128
_TW = 128
_PAD_T = 8  # top padding rows (>= 4-px halo, 8-aligned; f32 windows)
_PAD_T_U8 = 32  # uint8 windows: DMA offsets/shapes need 32-row alignment
_PAD_L = 128  # left padding cols (>= 4-px halo, 128-aligned)
_WW = _TW + 2 * _PAD_L  # 384: window cols


def _pad_t(dtype) -> int:
    return _PAD_T_U8 if dtype == jnp.uint8 else _PAD_T


def _fast_kernel(
    src_ref,  # ANY [N, HP, WP] f32 or u8 (padded: image at [pad_t:, PAD_L:])
    out_ref,  # VMEM [1, TH, TW] f32 — NMS'd score map tile
    scratch,  # VMEM [2, WH, WW] (source dtype)
    sem,  # DMA semaphores [2]
    *,
    h: int,
    w: int,
    ny: int,
    nx: int,
    threshold: float,
    border: int,
    pad_t: int = _PAD_T,
):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    nb = pl.num_programs(0)

    wh = _TH + 2 * pad_t  # window rows (tile + halo capacity)

    def start_dma(b_, ti_, tj_, slot):
        pltpu.make_async_copy(
            src_ref.at[b_, pl.ds(ti_ * _TH, wh), pl.ds(tj_ * _TW, _WW)],
            scratch.at[slot],
            sem.at[slot],
        ).start()

    # double-buffered window pipeline across grid steps
    step = (b * ny + ti) * nx + tj
    total = nb * ny * nx
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_dma(b, ti, tj, slot)

    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        tj_n = jax.lax.rem(nstep, nx)
        ti_n = jax.lax.rem(nstep // nx, ny)
        # clamp: the pl.when guard already excludes the overflow case,
        # but Mosaic's static range analysis bounds the affine index
        # without it and rejects the slice at b_n == nb
        b_n = jnp.minimum(nstep // (nx * ny), nb - 1)
        start_dma(b_n, ti_n, tj_n, jax.lax.rem(nstep, 2))

    pltpu.make_async_copy(
        src_ref.at[0, pl.ds(0, wh), pl.ds(0, _WW)],  # shape-only
        scratch.at[slot],
        sem.at[slot],
    ).wait()
    win = scratch[slot]
    if win.dtype == jnp.uint8:
        # raw u8 window DMA'd (4x less traffic than a materialised f32
        # copy), widened in-VMEM to bf16: every tree value is an
        # integer difference in [-255, 255], exact in bf16 (same
        # argument as ops/fast.py's XLA path), so scores are
        # BIT-IDENTICAL to the f32 kernel.  Mosaic has no direct
        # u8->bf16 cast; hop through int32 -> f32 (zero-extend, exact).
        win = (
            win.astype(jnp.int32).astype(jnp.float32)
            .astype(jnp.bfloat16)
        )

    # scores are needed on the tile plus a 1-px halo (for NMS): an
    # extended (TH+2, TW+2) region.  Its pixel (0,0) is the tile's
    # (-1,-1), sitting at window coords (pad_t-1, PAD_L-1).
    eh, ew = _TH + 2, _TW + 2
    oy, ox = pad_t - 1, _PAD_L - 1
    c = win[oy : oy + eh, ox : ox + ew]
    e = [
        win[oy + dy : oy + dy + eh, ox + dx : ox + dx + ew] - c
        for (dx, dy) in CIRCLE_OFFSETS
    ]

    def arc9_min(v):
        w2 = [jnp.minimum(v[i], v[(i + 1) % 16]) for i in range(16)]
        w4 = [jnp.minimum(w2[i], w2[(i + 2) % 16]) for i in range(16)]
        w8 = [jnp.minimum(w4[i], w4[(i + 4) % 16]) for i in range(16)]
        return [jnp.minimum(w8[i], v[(i + 8) % 16]) for i in range(16)]

    def list_max(v):
        while len(v) > 1:
            v = [
                jnp.maximum(v[i], v[i + len(v) // 2])
                for i in range(len(v) // 2)
            ]
        return v[0]

    # the min/max tree runs in the window dtype (bf16 for u8 sources —
    # exact for integer differences); comparisons/score widen to f32
    # (a bf16 compare crashed the Mosaic lowering)
    tb = list_max(arc9_min(e)).astype(jnp.float32)
    td = list_max(arc9_min([-ei for ei in e])).astype(jnp.float32)
    tf = jnp.float32(threshold)
    corner = (tb > tf) | (td > tf)
    score = jnp.maximum(tb, td) - 1.0

    # interior mask (FAST's own 3-px border), in GLOBAL image coords
    gy = (ti * _TH - 1) + jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0)
    gx = (tj * _TW - 1) + jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1)
    keep_region = (gy >= 3) & (gy < h - 3) & (gx >= 3) & (gx < w - 3)
    score = jnp.where(corner & keep_region, score, 0.0)

    # 3x3 NMS: tile pixels (center of the extended region) must be
    # strictly greater than every neighbour's score
    center = score[1 : 1 + _TH, 1 : 1 + _TW]
    nmax = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            nb_ = score[1 + dy : 1 + dy + _TH, 1 + dx : 1 + dx + _TW]
            nmax = nb_ if nmax is None else jnp.maximum(nmax, nb_)
    out = jnp.where(center > nmax, center, 0.0)
    if border > 3:
        # ORB's edge_threshold filter runs AFTER detection + NMS
        # (OpenCV runByImageBorder) — a border-band neighbour still
        # suppresses an interior corner
        cgy = gy[1 : 1 + _TH, 1 : 1 + _TW]
        cgx = gx[1 : 1 + _TH, 1 : 1 + _TW]
        in_border = (
            (cgy >= border) & (cgy < h - border)
            & (cgx >= border) & (cgx < w - border)
        )
        out = jnp.where(in_border, out, 0.0)
    out_ref[0, :, :] = out


@functools.partial(
    jax.jit, static_argnames=("threshold", "border", "interpret")
)
def fast_scores_batched(
    imgs: jnp.ndarray,  # [N, H, W] uint8 or float
    threshold: int = 20,
    border: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N,H,W] images -> [N,H,W] f32 NMS'd FAST score maps (score > 0
    <=> kept corner).  ``border`` additionally masks ORB's
    edge_threshold band.  One fused pass per tile; natively batched
    (the frame axis is a grid dimension — a vmapped pallas_call would
    give the ANY-space source a per-batch index map, which the TPU
    lowering rejects).  uint8 inputs keep their RAW dtype through the
    window DMA (4x less traffic; r4's warp-kernel trick) and the
    segment-test tree runs in bf16 — bit-identical scores, integer
    differences in [-255, 255] are exact in bf16."""
    n, h, w = imgs.shape
    x = imgs if imgs.dtype == jnp.uint8 else imgs.astype(jnp.float32)
    pad_t = _pad_t(x.dtype)
    wh = _TH + 2 * pad_t
    ny = pl.cdiv(h, _TH)
    nx = pl.cdiv(w, _TW)
    # pad: pad_t top rows + PAD_L left cols; bottom/right so that every
    # tile's window [ti*TH, ti*TH + WH) x [tj*TW, tj*TW + WW) is in
    # range.  Values are irrelevant (keep_region masks them) — zeros.
    hp = (ny - 1) * _TH + wh
    wp = (nx - 1) * _TW + _WW
    x = jnp.pad(x, ((0, 0), (pad_t, hp - h - pad_t),
                    (_PAD_L, wp - w - _PAD_L)))

    kernel = functools.partial(
        _fast_kernel, h=h, w=w, ny=ny, nx=nx,
        threshold=float(threshold), border=int(border), pad_t=pad_t,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        grid=(n, ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, _TH, _TW), lambda b, i, j: (b, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wh, _WW), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x)


@functools.lru_cache(maxsize=None)
def _core_for(threshold: int, border: int):
    """custom_vmap wrapper per static (threshold, border): vmap over
    frames maps onto the natively batched kernel instead of lifting the
    pallas_call (which the TPU lowering rejects for ANY-space inputs)."""

    @jax.custom_batching.custom_vmap
    def core(img):
        return fast_scores_batched(
            img[None], threshold=threshold, border=border,
            interpret=_interpret(),
        )[0]

    @core.def_vmap
    def _vmap(axis_size, in_batched, img):
        (ib,) = in_batched
        if not ib:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        return (
            fast_scores_batched(
                img, threshold=threshold, border=border,
                interpret=_interpret(),
            ),
            True,
        )

    return core


def _interpret() -> bool:
    import os

    return bool(os.environ.get("LIBSTACKER_FAST_INTERPRET"))


def fast_scores(img: jnp.ndarray, threshold: int = 20,
                border: int = 0) -> jnp.ndarray:
    """Single-image [H,W] -> [H,W] NMS'd score map (vmap-safe: batching
    maps onto the natively batched kernel).  ``threshold``/``border``
    must be Python ints (static)."""
    return _core_for(int(threshold), int(border))(img)


def usable(h: int, w: int) -> bool:
    """Kernel dispatch gate — OPT-IN (LIBSTACKER_FAST_PALLAS=1 or the
    test-mode force/interpret envs).

    Measured on v5e (r3): this one-pass kernel runs a 4K frame in
    ~9.1 ms vs ~7.2 ms for the XLA formulation in ops/fast.py — the
    16 circle taps + 8 NMS neighbours are shifted VMEM slices, and each
    lane-crossing shift costs a vector permute on the VPU, while XLA's
    shifted operands lower to plain offset HBM reads.  The kernel is
    kept (exact-parity, tested) as the building block for a future
    fused detect+top-k pass; the default detection path stays XLA."""
    import os

    if os.environ.get("LIBSTACKER_DISABLE_PALLAS"):
        return False
    # deliberately NOT keyed on LIBSTACKER_FORCE_PALLAS: that env
    # drives the warp/ECC/patch kernels in tests that don't set this
    # kernel's interpret switch
    return bool(os.environ.get("LIBSTACKER_FAST_PALLAS")) and (
        h >= 16 and w >= 16
    )
