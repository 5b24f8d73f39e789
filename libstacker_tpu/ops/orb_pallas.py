"""Pallas TPU kernel: per-keypoint patch extraction.

The ORB stages that follow detection (Harris re-ranking, the
intensity-centroid angle and steered rBRIEF sampling — OpenCV's
``ORB::detect_and_compute``, called by the reference at
src/utils.rs:174-183) need small pixel neighbourhoods around each
keypoint.  As XLA gathers these dominate the
whole keypoint pipeline on TPU (~2.8M gathered elements per 4K frame at
~25 ms); this kernel replaces them with one window DMA per keypoint:

- grid over keypoints; per step the (8,128)-aligned source window
  containing the patch is DMA'd to VMEM, dynamic rolls re-align it to
  the ideal origin (the same clip-floor-roll scheme as
  ops/warp_pallas), and the static side x side slice is written out;
- downstream Harris/IC-angle become static-slice elementwise math over
  [K, side, side] patches, and rBRIEF's rotated taps become two one-hot
  MXU einsums (row then column selection) — no gather anywhere.

Patch radii: the default 18 covers every DESCRIPTOR consumer — Harris
needs +-5 (7x7 block + Sobel support), the IC angle +-15, and rBRIEF's
rotated pattern taps +-18 (|pattern| <= 13 -> rotated |offset| <=
round(13*sqrt(2)) = 18; ORB's edge_threshold 31 keeps all taps
in-image).  Radius 21 (BLUR_RADIUS) additionally carries the
GaussianBlur(7, sigma 2) support, letting ops/orb.py blur the PATCHES
(a few hundred 43x43 tiles) instead of every full level image — exact,
because edge_threshold keeps the blur support off the image border.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_RADIUS = 18
PATCH_SIDE = 2 * PATCH_RADIUS + 1  # 37
# radius carrying the rBRIEF taps PLUS the Gaussian(7) blur support
BLUR_RADIUS = PATCH_RADIUS + 3
BLUR_SIDE = 2 * BLUR_RADIUS + 1  # 43


def _win_shape(side: int) -> Tuple[int, int]:
    """(8,128)-aligned window covering a ``side`` patch at any
    clip-floor-quantised origin: +7 row / +127 col slack."""
    wh = ((side + 7) + 7) // 8 * 8
    ww = ((side + 127) + 127) // 128 * 128
    return wh, ww


def _extract_kernel(
    coord_ref,  # SMEM [1, K, 2] int32 — this frame's window origins
    src_ref,  # ANY [N, Hp, Wp] f32 (full array, trivial index map)
    out_ref,  # VMEM [1, 1, side, side]
    scratch,  # VMEM [wh, ww]
    sem,
    *,
    hp: int,
    wp: int,
    side: int,
    wh: int,
    ww: int,
):
    n = pl.program_id(0)
    k = pl.program_id(1)
    y0i = coord_ref[0, k, 0]
    x0i = coord_ref[0, k, 1]
    r0 = (jnp.clip(y0i, 0, hp - wh) // 8) * 8
    c0 = (jnp.clip(x0i, 0, wp - ww) // 128) * 128
    cp = pltpu.make_async_copy(
        src_ref.at[n, pl.ds(r0, wh), pl.ds(c0, ww)], scratch, sem
    )
    cp.start()
    cp.wait()
    win = scratch[...]
    win = pltpu.roll(win, jnp.mod(r0 - y0i, wh), 0)
    win = pltpu.roll(win, jnp.mod(c0 - x0i, ww), 1)
    out_ref[0, 0] = win[:side, :side]


@functools.partial(jax.jit, static_argnames=("interpret", "radius"))
def extract_patches_batched(
    imgs: jnp.ndarray,  # [N, H, W] float32 (or castable)
    ys: jnp.ndarray,  # [N, K] int32 keypoint rows
    xs: jnp.ndarray,  # [N, K] int32 keypoint cols
    interpret: bool = False,
    radius: int = PATCH_RADIUS,
) -> jnp.ndarray:
    """[N, K] keypoints -> [N, K, side, side] f32 patches centred on
    each keypoint (``radius`` on every side); out-of-range centres are
    clamped.  Natively batched: a vmapped pallas_call would give the
    ANY-space source a per-batch index map, which the TPU lowering
    rejects — instead the batch is a leading grid dimension (see the
    custom_vmap rule on :func:`extract_patches_pallas`)."""
    side = 2 * radius + 1
    wh, ww = _win_shape(side)
    n, h, w = imgs.shape
    k = ys.shape[1]
    hp = max(((h + 7) // 8) * 8, wh)
    wp = max(((w + 127) // 128) * 128, ww)
    if (hp, wp) != (h, w):
        imgs = jnp.pad(
            imgs.astype(jnp.float32), ((0, 0), (0, hp - h), (0, wp - w))
        )
    y0 = jnp.clip(ys - radius, 0, h - side).astype(jnp.int32)
    x0 = jnp.clip(xs - radius, 0, w - side).astype(jnp.int32)
    coords = jnp.stack([y0, x0], axis=-1)  # [N, K, 2]
    return pl.pallas_call(
        functools.partial(
            _extract_kernel, hp=hp, wp=wp, side=side, wh=wh, ww=ww
        ),
        out_shape=jax.ShapeDtypeStruct((n, k, side, side), jnp.float32),
        grid=(n, k),
        in_specs=[
            # the whole [N,K,2] coord table overflows the ~1MB SMEM for
            # large bursts; stream one frame's coords per grid row
            pl.BlockSpec(
                (1, k, 2), lambda nn, kk: (nn, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, side, side), lambda nn, kk: (nn, kk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(coords, imgs.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _core_for(radius: int):
    @jax.custom_batching.custom_vmap
    def core(img, ys, xs):
        return extract_patches_batched(
            img[None], ys[None], xs[None], interpret=_interpret(),
            radius=radius,
        )[0]

    @core.def_vmap
    def _vmap(axis_size, in_batched, img, ys, xs):
        ib, yb, xb = in_batched
        if not ib:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        if not yb:
            ys = jnp.broadcast_to(ys[None], (axis_size,) + ys.shape)
        if not xb:
            xs = jnp.broadcast_to(xs[None], (axis_size,) + xs.shape)
        return (
            extract_patches_batched(
                img, ys, xs, interpret=_interpret(), radius=radius
            ),
            True,
        )

    return core


def _interpret() -> bool:
    import os

    return bool(os.environ.get("LIBSTACKER_ECC_INTERPRET"))


def extract_patches_pallas(
    img: jnp.ndarray, ys, xs, interpret: bool = False,
    radius: int = PATCH_RADIUS,
) -> jnp.ndarray:
    """[K] keypoints -> [K, side, side] f32 patches (single image;
    vmap-safe — batching maps onto the natively batched kernel)."""
    if interpret:
        import os

        os.environ["LIBSTACKER_ECC_INTERPRET"] = "1"
        try:
            return _core_for(radius)(
                img, ys.astype(jnp.int32), xs.astype(jnp.int32)
            )
        finally:
            del os.environ["LIBSTACKER_ECC_INTERPRET"]
    return _core_for(radius)(
        img, ys.astype(jnp.int32), xs.astype(jnp.int32)
    )


def extract_patches(
    img: jnp.ndarray, ys, xs, radius: int = PATCH_RADIUS
) -> jnp.ndarray:
    """Dispatch: Pallas window-DMA on TPU, XLA gather elsewhere.
    Returns [K, side, side] float32 with CLAMPED patch origins (patches
    of keypoints nearer than ``radius`` to a border shift inward; ORB
    keypoints never are)."""
    import os

    use_pallas = False
    if not os.environ.get("LIBSTACKER_DISABLE_PALLAS"):
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    if os.environ.get("LIBSTACKER_FORCE_PALLAS"):
        use_pallas = True
    if use_pallas:
        return extract_patches_pallas(
            img, ys, xs,
            interpret=bool(os.environ.get("LIBSTACKER_ECC_INTERPRET")),
            radius=radius,
        )
    side = 2 * radius + 1
    h, w = img.shape
    y0 = jnp.clip(ys - radius, 0, h - side)
    x0 = jnp.clip(xs - radius, 0, w - side)
    offs = jnp.arange(side)
    py = y0[:, None, None] + offs[None, :, None]
    px = x0[:, None, None] + offs[None, None, :]
    return img.astype(jnp.float32)[py, px]
