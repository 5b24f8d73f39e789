"""Pallas TPU kernel: per-keypoint patch extraction.

The ORB stages that follow detection (Harris re-ranking, the
intensity-centroid angle and steered rBRIEF sampling — OpenCV's
``ORB::detect_and_compute``, called by the reference at
src/utils.rs:174-183) need small pixel neighbourhoods around each
keypoint.  As XLA gathers these dominate the
whole keypoint pipeline on TPU (~2.8M gathered elements per 4K frame at
~25 ms); this kernel replaces them with one window DMA per keypoint:

- grid over keypoints; per step the (8,128)-aligned source window
  containing the patch is DMA'd to VMEM (48 x 256 covers a 37x37 patch
  for any alignment), dynamic rolls re-align it to the ideal origin
  (the same clip-floor-roll scheme as ops/warp_pallas), and the static
  37x37 slice is written out;
- downstream Harris/IC-angle become static-slice elementwise math over
  [K, 37, 37] patches, and rBRIEF's rotated taps become two one-hot
  MXU einsums (row then column selection) — no gather anywhere.

The patch radius 18 covers every consumer: Harris needs +-5 (7x7 block
+ Sobel support), the IC angle +-15, and rBRIEF's rotated pattern taps
+-18 (|pattern| <= 13 -> rotated |offset| <= round(13*sqrt(2)) = 18;
ORB's edge_threshold 31 keeps all taps in-image).
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
_WH = 48  # window rows: 37 + floor-8 start slack, rounded to 8
_WW = 256  # window cols: 37 + floor-128 start slack, rounded to 128


def _extract_kernel(
    coord_ref,  # SMEM [1, K, 2] int32 — this frame's window origins
    src_ref,  # ANY [N, Hp, Wp] f32 (full array, trivial index map)
    out_ref,  # VMEM [1, 1, PATCH_SIDE, PATCH_SIDE]
    scratch,  # VMEM [_WH, _WW]
    sem,
    *,
    hp: int,
    wp: int,
):
    n = pl.program_id(0)
    k = pl.program_id(1)
    y0i = coord_ref[0, k, 0]
    x0i = coord_ref[0, k, 1]
    r0 = (jnp.clip(y0i, 0, hp - _WH) // 8) * 8
    c0 = (jnp.clip(x0i, 0, wp - _WW) // 128) * 128
    cp = pltpu.make_async_copy(
        src_ref.at[n, pl.ds(r0, _WH), pl.ds(c0, _WW)], scratch, sem
    )
    cp.start()
    cp.wait()
    win = scratch[...]
    win = pltpu.roll(win, jnp.mod(r0 - y0i, _WH), 0)
    win = pltpu.roll(win, jnp.mod(c0 - x0i, _WW), 1)
    out_ref[0, 0] = win[:PATCH_SIDE, :PATCH_SIDE]


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_patches_batched(
    imgs: jnp.ndarray,  # [N, H, W] float32 (or castable)
    ys: jnp.ndarray,  # [N, K] int32 keypoint rows
    xs: jnp.ndarray,  # [N, K] int32 keypoint cols
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, K] keypoints -> [N, K, 37, 37] f32 patches centred on each
    keypoint (PATCH_RADIUS on every side); out-of-range centres are
    clamped.  Natively batched: a vmapped pallas_call would give the
    ANY-space source a per-batch index map, which the TPU lowering
    rejects — instead the batch is a leading grid dimension (see the
    custom_vmap rule on :func:`extract_patches_pallas`)."""
    n, h, w = imgs.shape
    k = ys.shape[1]
    hp = max(((h + 7) // 8) * 8, _WH)
    wp = max(((w + 127) // 128) * 128, _WW)
    if (hp, wp) != (h, w):
        imgs = jnp.pad(
            imgs.astype(jnp.float32), ((0, 0), (0, hp - h), (0, wp - w))
        )
    y0 = jnp.clip(ys - PATCH_RADIUS, 0, h - PATCH_SIDE).astype(jnp.int32)
    x0 = jnp.clip(xs - PATCH_RADIUS, 0, w - PATCH_SIDE).astype(jnp.int32)
    coords = jnp.stack([y0, x0], axis=-1)  # [N, K, 2]
    return pl.pallas_call(
        functools.partial(_extract_kernel, hp=hp, wp=wp),
        out_shape=jax.ShapeDtypeStruct(
            (n, k, PATCH_SIDE, PATCH_SIDE), jnp.float32
        ),
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
            (1, 1, PATCH_SIDE, PATCH_SIDE), lambda nn, kk: (nn, kk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_WH, _WW), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(coords, imgs.astype(jnp.float32))


@jax.custom_batching.custom_vmap
def _extract_patches_core(img, ys, xs):
    return extract_patches_batched(
        img[None], ys[None], xs[None], interpret=_interpret()
    )[0]


@_extract_patches_core.def_vmap
def _extract_patches_vmap(axis_size, in_batched, img, ys, xs):
    ib, yb, xb = in_batched
    if not ib:
        img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
    if not yb:
        ys = jnp.broadcast_to(ys[None], (axis_size,) + ys.shape)
    if not xb:
        xs = jnp.broadcast_to(xs[None], (axis_size,) + xs.shape)
    return extract_patches_batched(img, ys, xs, interpret=_interpret()), True


def _interpret() -> bool:
    import os

    return bool(os.environ.get("LIBSTACKER_ECC_INTERPRET"))


def extract_patches_pallas(
    img: jnp.ndarray, ys, xs, interpret: bool = False
) -> jnp.ndarray:
    """[K] keypoints -> [K, 37, 37] f32 patches (single image; vmap-safe
    — batching maps onto the natively batched kernel)."""
    if interpret:
        import os

        os.environ["LIBSTACKER_ECC_INTERPRET"] = "1"
        try:
            return _extract_patches_core(img, ys.astype(jnp.int32),
                                         xs.astype(jnp.int32))
        finally:
            del os.environ["LIBSTACKER_ECC_INTERPRET"]
    return _extract_patches_core(
        img, ys.astype(jnp.int32), xs.astype(jnp.int32)
    )


def extract_patches(img: jnp.ndarray, ys, xs) -> jnp.ndarray:
    """Dispatch: Pallas window-DMA on TPU, XLA gather elsewhere.
    Returns [K, 37, 37] float32 with CLAMPED patch origins (patches of
    keypoints nearer than PATCH_RADIUS to a border shift inward; ORB
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
        )
    h, w = img.shape
    y0 = jnp.clip(ys - PATCH_RADIUS, 0, h - PATCH_SIDE)
    x0 = jnp.clip(xs - PATCH_RADIUS, 0, w - PATCH_SIDE)
    offs = jnp.arange(PATCH_SIDE)
    py = y0[:, None, None] + offs[None, :, None]
    px = x0[:, None, None] + offs[None, None, :]
    return img.astype(jnp.float32)[py, px]
