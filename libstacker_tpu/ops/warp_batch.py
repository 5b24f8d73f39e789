"""Batched frame warping with automatic kernel dispatch.

Warps an [N,H,W,C] burst with per-frame matrices (forward OpenCV
semantics: the matrix is inverted internally like warpPerspective,
ref src/lib.rs:291-299): uses the Pallas tiled kernel on TPU for large
frames (ops.warp_pallas), the XLA-gather path elsewhere.  Only
BORDER_CONSTANT goes through the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import warp


def _pallas_usable(h: int, w: int) -> bool:
    import os

    if os.environ.get("LIBSTACKER_DISABLE_PALLAS"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and h >= 160 and w >= 384


def warp_frames_batch(
    frames: jnp.ndarray,  # [N,H,W,C] or [N,H,W] float32
    mats: jnp.ndarray,  # [N,3,3] (or [N,2,3] affine), forward maps
    perspective: bool = True,
    border_value=0.0,
) -> jnp.ndarray:
    """Warp each frame onto its own grid with BORDER_CONSTANT."""
    has_c = frames.ndim == 4
    n = frames.shape[0]
    h, w = frames.shape[1], frames.shape[2]
    m3 = mats if mats.shape[-2] == 3 else jax.vmap(warp.affine_to_3x3)(mats)
    if _pallas_usable(h, w):
        from . import warp_pallas

        minv = jnp.linalg.inv(m3.astype(jnp.float32))
        bv = jnp.broadcast_to(
            jnp.asarray(border_value, jnp.float32).reshape(-1),
            (frames.shape[-1],) if has_c else (1,),
        )
        if has_c:
            c = frames.shape[-1]
            src = jnp.moveaxis(frames, -1, 1).reshape(n * c, h, w)
            m_rep = jnp.repeat(minv, c, axis=0)
            bvs = jnp.tile(jnp.broadcast_to(bv, (c,)), (n,))
            out = warp_pallas.warp_bilinear_pallas(
                src, m_rep, border_value=bvs,
                quant_affine=not perspective,
            )
            out = out.reshape(n, c, h, w)
            return jnp.moveaxis(out, 1, -1)
        return warp_pallas.warp_bilinear_pallas(
            frames, minv, border_value=jnp.broadcast_to(bv[:1], (n,)),
            quant_affine=not perspective,
        )

    def warp_one(frame, m):
        if perspective:
            return warp.warp_perspective(
                frame, m, (h, w), border_mode="constant",
                border_value=border_value,
            )
        return warp.warp_affine(
            frame, m[:2], (h, w), border_mode="constant",
            border_value=border_value,
        )

    return jax.vmap(warp_one)(frames, m3)
