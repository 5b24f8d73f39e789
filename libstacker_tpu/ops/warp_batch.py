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


def pallas_pick_k(mats, h: int, w: int, ks=(3, 7)):
    """Smallest residual band k (from ``ks``) whose kernel domain covers
    EVERY forward matrix, or ``None`` when none does (fall back to the
    XLA-gather path).  The kernel's tap loop is O((2k+4)^2), so a small
    band is ~3x cheaper — burst alignment fits k=3."""
    for k in ks:
        if pallas_domain_ok_host(mats, h, w, k=k):
            return k
    return None


def pallas_domain_ok_host(mats, h: int, w: int, k: int = 7) -> bool:
    """Host-side dispatch decision: True iff EVERY forward matrix's
    inverse map stays inside the Pallas kernel's residual-displacement
    domain (ops.warp_pallas.residual_domain_ok).  Pipelines call this
    once per burst (a tiny [N,3,3] sync) and pass the static result to
    their jitted warp stage, so out-of-domain warps (wild RANSAC
    homographies, large legitimate rotations) fall back to the exact
    XLA-gather path instead of silently clipping to the border."""
    import numpy as np

    from . import warp_pallas

    if not _pallas_usable(h, w):
        return False
    m = np.asarray(jax.device_get(mats), np.float64)
    m3 = m if m.shape[-2] == 3 else np.concatenate(
        [m, np.tile(np.asarray([[[0.0, 0.0, 1.0]]]), (m.shape[0], 1, 1))],
        axis=1,
    )
    dets = np.linalg.det(m3)
    if not np.all(np.isfinite(m3)) or np.any(np.abs(dets) < 1e-12):
        return False
    minv = np.linalg.inv(m3)
    ok = warp_pallas.residual_domain_ok(
        minv.astype(np.float32), h, w, k=k, xp=np
    )
    return bool(np.asarray(ok).all())


def warp_frames_batch(
    frames: jnp.ndarray,  # [N,H,W,C] or [N,H,W] float32
    mats: jnp.ndarray,  # [N,3,3] (or [N,2,3] affine), forward maps
    perspective: bool = True,
    border_value=0.0,
    allow_pallas: bool = True,
    pallas_k: int = 7,
) -> jnp.ndarray:
    """Warp each frame onto its own grid with BORDER_CONSTANT.

    ``allow_pallas``: static host-computed dispatch decision (see
    :func:`pallas_domain_ok_host`) — the Pallas kernel's correctness
    domain is a k-pixel bound on in-tile warp-field variation, so
    callers with potentially-large warps must pre-check.  ``pallas_k``
    is the band that check validated (see :func:`pallas_pick_k`)."""
    has_c = frames.ndim == 4
    n = frames.shape[0]
    h, w = frames.shape[1], frames.shape[2]
    m3 = mats if mats.shape[-2] == 3 else jax.vmap(warp.affine_to_3x3)(mats)
    if allow_pallas and _pallas_usable(h, w):
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
                quant_affine=not perspective, k=pallas_k,
            )
            out = out.reshape(n, c, h, w)
            return jnp.moveaxis(out, 1, -1)
        return warp_pallas.warp_bilinear_pallas(
            frames, minv, border_value=jnp.broadcast_to(bv[:1], (n,)),
            quant_affine=not perspective, k=pallas_k,
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
