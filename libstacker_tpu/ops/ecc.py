"""Batched Enhanced Correlation Coefficient (ECC) alignment engine.

TPU-native re-implementation of OpenCV's ``findTransformECC``
(Evangelidis & Psarakis, PAMI 2008) — the reference's dominant hot loop
(SURVEY.md N9; call sites ref src/lib.rs:769-777, 931-939).  Where the
reference runs one iterative C++ solver per Rayon thread, this engine is
**one batched device program per slab**: an explicitly batched
Gauss-Newton iteration (warps via the fused Pallas kernel on TPU,
Hessian solves and projections batched on the MXU) inside a
``lax.while_loop`` of unrolled ``lax.scan`` chunks with per-frame
convergence masking; a host driver slices the solve into bounded slabs
(the TPU runtime kills single long-running programs) and optionally
runs coarse-to-fine octaves.

Faithfulness to OpenCV ecc.cpp:
- Gaussian pre-filter of template and input with ``gauss_filt_size``
  (sigma 0 -> OpenCV's fixed small kernels / derived sigma).
- Input-image gradients with the [-0.5, 0, 0.5] central-difference
  filter (reflect-101 border).
- Per iteration: inverse-map warps of image and gradients onto the
  template grid, an INTER_NEAREST-warped validity mask, masked
  zero-mean statistics, the motion-specific Jacobian, Gauss-Newton
  style update via the 8x8 (or smaller) projected Hessian, and the
  ``|rho - last_rho| < eps`` termination test evaluated at loop top.
- Failure cases (NaN rho, lambda_d <= 0) are reported per frame via an
  ``ok`` flag instead of aborting the batch (flagged deviation: the
  reference aborts the whole stack, SURVEY.md §5).

Motion models: Translation (2 dof), Euclidean (3), Affine (6),
Homography (8) — parameter ordering and update rules match OpenCV's
``update_warping_matrix_ECC`` exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants
from ..params import MotionType
from . import filters, warp

_HIGHEST = jax.lax.Precision.HIGHEST

# Env-gated stderr timing for the coarse-to-fine driver (octave build /
# per-level solve / sync-round counts); costs nothing when unset.
import os as _os_mod

_ECC_PROFILE = bool(_os_mod.environ.get("LIBSTACKER_ECC_PROFILE"))

# Iterations per while_loop chunk: early exit happens at chunk
# granularity (<= _CHUNK_ITERS - 1 wasted masked iterations; typical
# eps-converged solves take 4-8 iterations, so keep chunks small).
_CHUNK_ITERS = 4


def _ecc_warp_k() -> Optional[int]:
    """Residual-displacement bound override for the Pallas kernels in
    ECC iterations.  ``None`` (default) = adaptive: the driver tries
    k=3 first (the tap loop is O((2k+4)^2), so small k is ~3x cheaper)
    and escalates to k=7 then to the XLA path when the in-loop domain
    check flags a lane.  Set LIBSTACKER_ECC_WARP_K to pin a value."""
    import os

    v = os.environ.get("LIBSTACKER_ECC_WARP_K")
    if not v:
        return None
    try:
        k = int(v)
    except ValueError:
        raise ValueError(
            f"LIBSTACKER_ECC_WARP_K must be an integer in 1..40, got {v!r}"
        ) from None
    if not 1 <= k <= 40:
        raise ValueError(
            f"LIBSTACKER_ECC_WARP_K must be in 1..40 (kernel residual "
            f"band), got {k}"
        )
    return k


# adaptive escalation ladder — the kernels' tap loop is O((2k+4)^2),
# so each rung is ~2.8x cheaper than the next: k=1 covers near-pure
# translations (in-tile spread < 1.5 px, i.e. rotations to ~1 deg at
# 128px tiles — typical handheld bursts), k=3 to ~2 deg, k=7 to
# ~4.7 deg; beyond that the exact XLA-gather path takes over.
# Escalation re-solves ONLY the flagged lanes, warm-started.
_K_LADDER = (1, 3, 7)

# lanes per batched solve: bounds the fused kernel's SMEM accumulator
# and each device program's size; bigger bursts chunk at the host level
_MAX_SOLVE_LANES = 64


class EccResult(NamedTuple):
    rho: jnp.ndarray  # correlation coefficient, [] or [N]
    warp_matrix: jnp.ndarray  # [2,3] or [3,3] (batched: leading N)
    ok: jnp.ndarray  # bool, False if the solver hit an OpenCV error case
    num_iters: jnp.ndarray  # iterations actually executed


def identity_warp(motion_type: MotionType, dtype=jnp.float32) -> jnp.ndarray:
    """Initial warp: eye(2,3) for non-homography, eye(3,3) for homography
    (ref src/lib.rs:763-767)."""
    if motion_type == MotionType.Homography:
        return jnp.eye(3, dtype=dtype)
    return jnp.eye(2, 3, dtype=dtype)


def _as_3x3(m: jnp.ndarray) -> jnp.ndarray:
    return m if m.shape[-2] == 3 else warp.affine_to_3x3(m)


def _update_warp(
    motion_type: MotionType, m: jnp.ndarray, dp: jnp.ndarray
) -> jnp.ndarray:
    """OpenCV update_warping_matrix_ECC parameter ordering."""
    if motion_type == MotionType.Translation:
        return m.at[0, 2].add(dp[0]).at[1, 2].add(dp[1])
    if motion_type == MotionType.Euclidean:
        new_theta = dp[0] + jnp.arcsin(jnp.clip(m[1, 0], -1.0, 1.0))
        c, s = jnp.cos(new_theta), jnp.sin(new_theta)
        return jnp.array(
            [[c, -s, m[0, 2] + dp[1]], [s, c, m[1, 2] + dp[2]]], dtype=m.dtype
        )
    if motion_type == MotionType.Affine:
        upd = jnp.array(
            [[dp[0], dp[2], dp[4]], [dp[1], dp[3], dp[5]]], dtype=m.dtype
        )
        return m + upd
    upd = jnp.array(
        [
            [dp[0], dp[3], dp[6]],
            [dp[1], dp[4], dp[7]],
            [dp[2], dp[5], 0.0],
        ],
        dtype=m.dtype,
    )
    return m + upd


def _compose_warp_ic(
    motion_type: MotionType, m: jnp.ndarray, dp: jnp.ndarray
) -> jnp.ndarray:
    """Inverse-compositional warp update: ``dp`` was solved on the
    template side (T(w(dp) x) ~ I(W x)), so the inverse-map warp
    composes as W <- W @ inv(w(dp)) — ``w(dp)`` being the OpenCV
    parameter layout applied to the identity (see ``_update_warp``).
    Translation/Euclidean/Affine compositions stay exactly in their
    motion class (rigid @ rigid = rigid), so taking the top two rows is
    structure-preserving; homographies renormalise m22 to 1."""
    delta = _update_warp(motion_type, identity_warp(motion_type, m.dtype), dp)
    new = _as_3x3(m) @ jnp.linalg.inv(_as_3x3(delta))
    if motion_type == MotionType.Homography:
        return new / new[2, 2]
    return new[:2]


_ECC_MODES = ("forward", "lazy", "ic")


def _ecc_mode_default() -> str:
    """Solver formulation: 'forward' (OpenCV's forward-additive ECC,
    bit-faithful), 'lazy' (forward linearisation with the Jacobian Gram
    computed once per lane and carried — 30 instead of 66 per-iteration
    kernel reductions for homography, same fixed point) or 'ic'
    (inverse-compositional — template-side Jacobian, cheapest sweeps
    but biased on aliasing-prone content; see ops/ecc_pallas.py).
    Overridable via LIBSTACKER_ECC_MODE."""
    import os

    v = os.environ.get("LIBSTACKER_ECC_MODE", "").strip().lower()
    if not v:
        return "forward"
    if v not in _ECC_MODES:
        raise ValueError(
            f"LIBSTACKER_ECC_MODE must be one of {_ECC_MODES}, got {v!r}"
        )
    return v


def find_transform_ecc(
    template: jnp.ndarray,
    input_image: jnp.ndarray,
    motion_type: MotionType = MotionType.Affine,
    num_iters: int = 200,
    eps: float = -1.0,
    gauss_filt_size: int = 5,
    warp_init: Optional[jnp.ndarray] = None,
    mode: Optional[str] = None,
    input_mask: Optional[jnp.ndarray] = None,
) -> EccResult:
    """Estimate the warp aligning ``input_image`` to ``template``.

    Semantics match ``cv2.findTransformECC(template, input, warp, motion,
    criteria, input_mask, gauss_filt_size)``: the returned matrix ``M`` warps
    ``input_image`` onto the template grid via dst(x,y) = input(M(x,y))
    (i.e. the WARP_INVERSE_MAP convention used internally; the caller
    then applies plain ``warp_affine``/``warp_perspective`` exactly like
    the reference does at src/lib.rs:780-803).

    ``template`` / ``input_image``: [H,W] uint8 or float (raw 0..255
    scale, like OpenCV's internal convertTo(CV_32F) without rescaling).

    Runs through the host-slabbed batched driver: the solve is sliced
    into bounded device programs (the TPU runtime kills long-running
    ones) and uses the fused Pallas iteration kernel on TPU.  For a
    fully in-graph (traceable) solve use
    :func:`find_transform_ecc_batched_graph`.
    """
    res = find_transform_ecc_batched(
        jnp.asarray(template)[None],
        input_image,
        motion_type=motion_type,
        num_iters=num_iters,
        eps=eps,
        gauss_filt_size=gauss_filt_size,
        warp_init=(
            None if warp_init is None
            else jnp.asarray(warp_init, jnp.float32)[None]
        ),
        mode=mode,
        input_mask=input_mask,
    )
    return EccResult(
        rho=res.rho[0],
        warp_matrix=res.warp_matrix[0],
        ok=res.ok[0],
        num_iters=res.num_iters[0],
    )


def _input_fields(input_image, gauss_filt_size):
    """Input-side fields: Gaussian pre-filter + central-difference
    gradients (OpenCV ecc.cpp's image preparation)."""
    image_f = filters.gaussian_blur(
        input_image.astype(jnp.float32), gauss_filt_size
    )
    dx = (-0.5, 0.0, 0.5)
    gx = filters.sep_filter2d(image_f, dx, (1.0,), border="reflect101")
    gy = filters.sep_filter2d(image_f, (1.0,), dx, border="reflect101")
    return image_f, gx, gy


def _prepare_inputs(templates, input_image, gauss_filt_size):
    image_f, gx, gy = _input_fields(input_image, gauss_filt_size)
    templates_f = filters.gaussian_blur(
        templates.astype(jnp.float32), gauss_filt_size
    )
    return templates_f, image_f, gx, gy


@functools.partial(jax.jit, static_argnames=("gauss_filt_size",))
def _ecc_prepare_input_masked_jit(input_image, input_mask, gauss_filt_size):
    """Input-side fields plus OpenCV's inputMask preprocessing
    (ecc.cpp): threshold the mask to 0/1, Gaussian-blur it with the
    same ``gauss_filt_size``, re-threshold at 0.95 via the
    ``* 0.5/0.95`` + rounding-convert trick (an erosion by the blur
    support, so no partially-masked pixel survives), and pre-multiply
    the input gradients by the resulting binary mask — exactly what
    ``gradientX.mul(preMaskFloat)`` does before the iteration loop."""
    image_f, gx, gy = _input_fields(input_image, gauss_filt_size)
    pre = (input_mask > 0).astype(jnp.float32)
    pre_f = filters.gaussian_blur(pre, gauss_filt_size)
    # cvRound is round-half-even, same as jnp.round
    pre_bin = jnp.round(pre_f * (0.5 / 0.95))
    return image_f, gx * pre_bin, gy * pre_bin, pre_bin


def _reactivate_carry(carry, eps, lane_mask):
    """Warm-start the ``lane_mask`` lanes for another solve pass: keep
    their frozen (best-so-far) warps, reset rho / iteration budget like
    a fresh solve, leave every other lane untouched (they stay inactive
    inside the loop).  IC-mode carries (8 elements) also invalidate the
    reactivated lanes' carried Hessians — a domain-escaped lane's H was
    computed at a warp whose kernel stats were garbage."""
    m, rho, last_rho, it, ok, esc = carry[:6]
    re = lane_mask
    base = (
        m,
        jnp.where(re, jnp.float32(-1.0), rho),
        jnp.where(re, jnp.float32(-float(eps)), last_rho),
        jnp.where(re, 0, it),
        ok | re,
        esc & ~re,
    )
    if len(carry) > 6:
        hess, h_ok = carry[6], carry[7]
        base = base + (hess, h_ok & ~re)
    return base


def find_transform_ecc_batched_graph(
    templates: jnp.ndarray,
    input_image: jnp.ndarray,
    motion_type: MotionType = MotionType.Affine,
    num_iters: int = 200,
    eps: float = -1.0,
    gauss_filt_size: int = 5,
    warp_init: Optional[jnp.ndarray] = None,
    mode: Optional[str] = None,
    input_mask: Optional[jnp.ndarray] = None,
    coarse_levels: int = 0,
) -> EccResult:
    """In-graph batched ECC (traceable inside jit / shard_map): one warp
    per template frame against a shared input image.  On TPU the solve
    runs through the fused Pallas iteration kernel with an IN-GRAPH
    escalation ladder over ``_K_LADDER`` bands: lanes flagged by a
    rung's residual-domain check are warm-started from their frozen
    warps into the next rung's while_loop (which exits immediately —
    one condition eval — when nothing escalated).  Lanes outside even
    the widest band report ok=False; a final in-graph domain check
    makes ``ok`` a rigorous guarantee that the returned warp sits
    inside the widest band, so callers (the sharded ``ecc_stack_step``)
    can feed ok-lanes straight into the Pallas stacking warp.  Prefer
    :func:`find_transform_ecc_batched` at the host level — it slices
    the solve into bounded device programs (the TPU runtime kills
    single long-running programs) and rescues escaped lanes on the
    exact XLA path.

    ``input_mask`` ([H,W], nonzero = valid): cv2's ``inputMask``
    semantics, identical to the host driver's (the mask is binarised,
    blurred, re-thresholded and pre-multiplied into the input
    gradients; every iteration nearest-warps it) — traced in-graph so
    masked solves work under shard_map.

    ``coarse_levels`` > 0 runs the in-graph coarse-to-fine cascade:
    octaves are built by cascaded 2x INTER_AREA reductions (matmul
    resizes — shard_map safe) and each level's solve warm-starts the
    next; the full-resolution solve owns the exact criteria.  No
    cross-scale rho seeding (the fine solve always confirms
    convergence on its own content).

    ``mode``: 'forward' or 'lazy' run as requested; 'ic' is DOWNGRADED
    to 'forward' here — the in-graph solve has no XLA rescue stage, and
    IC relies on one (its template-resampled linearisation disagrees
    with the input-resampled rho on aliasing-prone content, tripping
    the divergence guard near convergence; the host driver finishes
    such lanes on the exact forward path, in-graph there is nowhere to
    send them).  'lazy' shares forward's fixed point and needs no
    rescue, so it is safe under shard_map."""
    if mode is None:
        mode = _ecc_mode_default()
    if mode not in _ECC_MODES:
        raise ValueError(f"mode must be one of {_ECC_MODES}, got {mode!r}")
    if mode == "ic":
        mode = "forward"
    if coarse_levels > 0:
        n0, h0, w0 = templates.shape
        levels = [
            lvl for lvl in range(1, coarse_levels + 1)
            if min(h0, w0) // 2 ** lvl >= 64
        ]
        octaves = {}
        tl, il = templates, input_image
        ml = (
            None if input_mask is None
            else (jnp.asarray(input_mask) > 0).astype(jnp.float32)
        )
        from . import resize as _resize
        from .. import constants as _constants

        for lvl in range(1, (max(levels) + 1) if levels else 1):
            s = 2 ** lvl
            dh, dw = h0 // s, w0 // s
            tl = _resize.resize(tl, (dh, dw), _constants.INTER_AREA)
            il = _resize.resize(il, (dh, dw), _constants.INTER_AREA)
            if ml is not None:
                ml = _resize.resize(ml, (dh, dw), _constants.INTER_AREA)
            if lvl in levels:
                # conservative mask downscale (same rule as the host
                # driver): a coarse pixel stays valid only if >= half
                # its INTER_AREA footprint was
                octaves[lvl] = (tl, il, None if ml is None else ml >= 0.5)
        init = warp_init
        init_at_full_scale = warp_init is not None
        for lvl in sorted(octaves, reverse=True):
            s = 2 ** lvl
            tl, il, mlv = octaves[lvl]
            if init_at_full_scale:
                init = _rescale_warp_batch(init, motion_type, 1.0 / s)
                init_at_full_scale = False
            res = find_transform_ecc_batched_graph(
                tl, il, motion_type, num_iters, eps, gauss_filt_size,
                warp_init=init, mode=mode, input_mask=mlv,
                coarse_levels=0,
            )
            # a failed/frozen octave lane's iterate is not a meaningful
            # warm start — hand the finer level this level's own init
            base = (
                jnp.tile(identity_warp(motion_type)[None], (n0, 1, 1))
                if init is None else init
            )
            wm = jnp.where(res.ok[:, None, None], res.warp_matrix, base)
            init = _rescale_warp_batch(wm, motion_type, 2.0)
        return find_transform_ecc_batched_graph(
            templates, input_image, motion_type, num_iters, eps,
            gauss_filt_size, warp_init=init, mode=mode,
            input_mask=input_mask, coarse_levels=0,
        )
    pre_mask = None
    if input_mask is not None:
        image_f, gx, gy, pre_mask = _ecc_prepare_input_masked_jit(
            input_image, input_mask, gauss_filt_size
        )
        templates_f = filters.gaussian_blur(
            templates.astype(jnp.float32), gauss_filt_size
        )
    else:
        templates_f, image_f, gx, gy = _prepare_inputs(
            templates, input_image, gauss_filt_size
        )
    n, h, w = templates_f.shape
    warp0 = identity_warp(motion_type)
    # tie the carry init to the input data so the carry has the same
    # varying-manual-axes type as the body output under shard_map
    vzero = templates_f[0, 0, 0] * 0.0
    m_init = (
        jnp.tile(warp0[None], (n, 1, 1)) if warp_init is None
        else jnp.asarray(warp_init, jnp.float32)
    )
    carry = (
        m_init + vzero,
        jnp.full((n,), -1.0, jnp.float32) + vzero,
        jnp.full((n,), -float(eps), jnp.float32) + vzero,
        jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), bool) & (vzero == 0.0),
        jnp.zeros((n,), bool) | (vzero != 0.0),
    )
    use_pallas = _pallas_ok(h, w) and tuple(image_f.shape) == (h, w)
    if not use_pallas:
        final = _ecc_loop_batched(
            templates_f, image_f, gx, gy, carry, motion_type, num_iters,
            eps, None, False, pre_mask=pre_mask,
        )
        m, rho, _, it, ok, _ = final[:6]
        return EccResult(rho=rho, warp_matrix=m, ok=ok, num_iters=it)

    if mode == "lazy":
        p = motion_type.num_params
        carry = carry + (
            jnp.zeros((n, p, p), jnp.float32) + vzero,  # carried Gram
            jnp.zeros((n,), bool) | (vzero != 0.0),  # h_ok
        )
    for ki, k in enumerate(_K_LADDER):
        if ki > 0:
            # warm-start ONLY the domain-escalated lanes at the wider
            # band (converged lanes enter the next loop inactive)
            carry = _reactivate_carry(carry, eps, carry[5] & ~carry[4])
        carry = _ecc_loop_batched(
            templates_f, image_f, gx, gy, carry, motion_type, num_iters,
            eps, None, True, k, mode, pre_mask,
        )
    m, rho, _, it, ok, _ = carry[:6]
    from . import warp_pallas

    # final band check on the returned warp (the in-loop check ran on
    # the PRE-update iterate) — in both directions: the solve consumed
    # M as the inverse map, but the stacking warp consumes inv(M)
    # (forward OpenCV semantics, ref src/lib.rs:780-803)
    m3 = jax.vmap(_as_3x3)(m)
    k_last = _K_LADDER[-1]
    ok = (
        ok
        & warp_pallas.residual_domain_ok(m3, h, w, k=k_last)
        & warp_pallas.residual_domain_ok(
            jnp.linalg.inv(m3), h, w, k=k_last
        )
    )
    return EccResult(rho=rho, warp_matrix=m, ok=ok, num_iters=it)


def _jacobian_fields_batched(
    motion_type: MotionType,
    gxw: jnp.ndarray,  # [B,H,W]
    gyw: jnp.ndarray,
    xg: jnp.ndarray,  # [H,W]
    yg: jnp.ndarray,
    m3: jnp.ndarray,  # [B,3,3]
) -> jnp.ndarray:
    """Batched variant of :func:`_jacobian_fields` -> [B,P,H,W]."""
    xb = xg[None]
    yb = yg[None]
    if motion_type == MotionType.Translation:
        return jnp.stack([gxw, gyw], axis=1)
    if motion_type == MotionType.Euclidean:
        h0 = m3[:, 0, 0][:, None, None]
        h1 = m3[:, 1, 0][:, None, None]
        hat_x = -xb * h1 - yb * h0
        hat_y = xb * h0 - yb * h1
        return jnp.stack([gxw * hat_x + gyw * hat_y, gxw, gyw], axis=1)
    if motion_type == MotionType.Affine:
        return jnp.stack(
            [gxw * xb, gyw * xb, gxw * yb, gyw * yb, gxw, gyw], axis=1
        )
    c = lambda i, j: m3[:, i, j][:, None, None]
    den = xb * c(2, 0) + yb * c(2, 1) + 1.0
    inv_den = 1.0 / den
    hat_x = (xb * c(0, 0) + yb * c(0, 1) + c(0, 2)) * inv_den
    hat_y = (xb * c(1, 0) + yb * c(1, 1) + c(1, 2)) * inv_den
    gxd = gxw * inv_den
    gyd = gyw * inv_den
    tmp = hat_x * gxd + hat_y * gyd
    return jnp.stack(
        [gxd * xb, gyd * xb, -tmp * xb, gxd * yb, gyd * yb, -tmp * yb,
         gxd, gyd],
        axis=1,
    )


def _ecc_loop_batched(
    templates_f: jnp.ndarray,  # [B,H,W]
    image_f: jnp.ndarray,  # [H,W]
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    carry,  # batched (m [B,r,3], rho [B], last_rho [B], it [B], ok [B])
    motion_type: MotionType,
    num_iters: int,
    eps,
    slab_iters: Optional[int],
    use_pallas: bool,
    warp_k: int = 7,
    mode: str = "forward",
    pre_mask: Optional[jnp.ndarray] = None,
) -> tuple:
    """Explicitly-batched Gauss-Newton ECC slab.  With ``use_pallas``
    each iteration runs as ONE fused Pallas sweep (ops/ecc_pallas.py)
    that warps, masks, builds the Jacobian and reduces to ~66 Gram-sum
    scalars per lane in-tile — no image-sized intermediate ever returns
    to HBM (the XLA path materialises [B,3,H,W] warps plus a [B,P,H,W]
    Jacobian stack and is kept as the exact reference/fallback).

    ``mode='ic'`` (with ``use_pallas``; the XLA path always runs the
    exact forward formulation) switches to the inverse-compositional
    sweep: the template-side Jacobian Gram is computed once per lane
    (``with_hessian`` kernel variant on each lane's first active
    iteration) and carried, and the warp update composes
    W <- W @ inv(w(dp)) — see ops/ecc_pallas.py's IC section.  The
    carry then has two extra entries (hessian [B,P,P], h_ok [B]).

    ``pre_mask`` (XLA path only; the driver gates ``use_pallas`` off
    when a mask is given): OpenCV inputMask support — the preprocessed
    binary mask (see :func:`_ecc_prepare_input_masked_jit`) is warped
    with INTER_NEAREST + BORDER_CONSTANT(0) by each lane's current
    warp and replaces the all-ones validity mask in the zero-mean
    statistics, exactly like ecc.cpp's per-iteration
    ``warpAffine(preMaskFloat, imageMask, map, maskFlags)``."""
    b, hd, wd = templates_f.shape
    hs, ws = image_f.shape
    xg = jnp.arange(wd, dtype=jnp.float32)[None, :] * jnp.ones(
        (hd, 1), dtype=jnp.float32
    )
    yg = jnp.arange(hd, dtype=jnp.float32)[:, None] * jnp.ones(
        (1, wd), dtype=jnp.float32
    )
    n_params = motion_type.num_params
    perspective = motion_type == MotionType.Homography
    srcs = jnp.stack([image_f, gx, gy])  # [3,H,W] shared across lanes
    ic = use_pallas and mode == "ic"
    lazy = use_pallas and mode == "lazy"
    if use_pallas and pre_mask is not None:
        # masked fused path: the preprocessed binary inputMask rides as
        # a 4th source plane and the kernel nearest-taps it in place of
        # the all-ones validity mask (the gradients in srcs[1:3] are
        # already pre-multiplied by it)
        assert not ic, "masked solves use the forward/lazy kernels"
        srcs = jnp.concatenate([srcs, pre_mask[None]], axis=0)
    tmpl_p = None
    if use_pallas:
        # the kernel uses one extent for both the output grid and the
        # source bounds — true for every ECC path (template and input
        # are the same size)
        assert (hd, wd) == (hs, ws), (templates_f.shape, image_f.shape)
        # pre-pad to (8,128)-aligned extents ONCE, outside the GN loop
        # (the kernel's window-origin clip bounds require aligned dims)
        hp = ((hs + 7) // 8) * 8
        wp = ((ws + 127) // 128) * 128
        if (hp, wp) != (hs, ws):
            srcs = jnp.pad(srcs, ((0, 0), (0, hp - hs), (0, wp - ws)))
        if ic:
            # IC DMAs haloed template windows manually -> templates need
            # the same alignment pre-pad (once per slab program)
            tmpl_p = (
                templates_f if (hp, wp) == (hd, wd)
                else jnp.pad(
                    templates_f, ((0, 0), (0, hp - hd), (0, wp - wd))
                )
            )

    def warp_all(m3b):
        # [B,3,H,W]: every lane warps the 3 shared sources with its
        # matrix (XLA-gather reference path; the TPU path never
        # materialises warped fields — see the fused-moments branch)
        def one_lane(m3):
            if perspective:
                f = lambda s: warp.warp_perspective(
                    s, m3, (hd, wd), border_mode="constant",
                    border_value=0.0, inverse_map=True,
                )
            else:
                f = lambda s: warp.warp_affine(
                    s, m3[:2], (hd, wd), border_mode="constant",
                    border_value=0.0, inverse_map=True,
                )
            return jax.vmap(f)(srcs)

        return jax.vmap(one_lane)(m3b)

    update_fn = jax.vmap(
        lambda mm, dp: _update_warp(motion_type, mm, dp)
    )
    compose_fn = jax.vmap(
        lambda mm, dp: _compose_warp_ic(motion_type, mm, dp)
    )

    def iter_body(c, _):
        m, rho, last_rho, it, ok, esc = c[:6]
        extras = c[6:]
        active = (it < num_iters) & (jnp.abs(rho - last_rho) >= eps) & ok
        if slab_iters is not None:
            active = active & (it < it_slab_end)
        m3 = jax.vmap(_as_3x3)(m)

        if ic:
            # Inverse-compositional sweep: template-side Jacobian, Gram
            # carried across iterations (computed by the with_hessian
            # kernel variant on each lane's first active iteration).
            from . import ecc_pallas

            hess_c, h_ok = extras
            need_h = active & ~h_ok
            kw = dict(
                motion_type=motion_type, k=warp_k, tile=_ecc_tile(ws),
                quant_affine=not perspective, true_hw=(hs, ws),
                interpret=_ecc_interpret(), active=active,
            )

            def full_fn(_):
                mom = ecc_pallas.ecc_ic_iteration_moments(
                    srcs[0], tmpl_p, m3, with_hessian=True, **kw
                )
                out_ = ecc_pallas.unpack_ic_moments(mom, motion_type, True)
                return out_[:-1], out_[-1]

            def lite_fn(_):
                mom = ecc_pallas.ecc_ic_iteration_moments(
                    srcs[0], tmpl_p, m3, with_hessian=False, **kw
                )
                return (
                    ecc_pallas.unpack_ic_moments(mom, motion_type, False),
                    jnp.zeros_like(hess_c),
                )

            (n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti, j_i, j_m, j_mt), \
                hess_new = jax.lax.cond(
                    jnp.any(need_h), full_fn, lite_fn, None
                )
            hess_c = jnp.where(need_h[:, None, None], hess_new, hess_c)
            extras = (hess_c, h_ok | active)

            n = jnp.maximum(n_raw, 1.0)
            img_mean = s_mi / n
            img_std = jnp.sqrt(jnp.maximum(s_mii / n - img_mean**2, 0.0))
            tmp_mean = s_mt / n
            tmp_std = jnp.sqrt(jnp.maximum(s_mtt / n - tmp_mean**2, 0.0))
            img_norm = jnp.sqrt(n) * img_std
            tmp_norm = jnp.sqrt(n) * tmp_std
            correlation = (
                s_mti - img_mean * s_mt - tmp_mean * s_mi
                + tmp_mean * img_mean * n_raw
            )
            image_proj = j_i - img_mean[:, None] * j_m
            template_proj = j_mt - tmp_mean[:, None] * j_m

            hessian_inv = jnp.linalg.inv(hess_c)
            new_rho = correlation / (img_norm * tmp_norm)
            # role-swapped ECC update: the template is the moving image
            tph = jnp.einsum("bpq,bq->bp", hessian_inv, template_proj)
            lambda_n = tmp_norm**2 - jnp.sum(template_proj * tph, axis=1)
            lambda_d = correlation - jnp.sum(image_proj * tph, axis=1)
            failed = jnp.isnan(new_rho) | (lambda_d <= 0.0)
            # rho-monotonicity divergence guard: the frozen template
            # Hessian blunts the role-swapped lambda_d test on diverging
            # lanes (the forward test is what makes OpenCV abort with
            # "correlation is going to be minimized"), so a lane whose
            # correlation DROPS by more than the convergence granularity
            # is flagged failed here instead of silently settling at a
            # junk stationary point; the host driver's final rescue pass
            # then re-solves it with the exact forward formulation for
            # OpenCV's verdict.
            diverged = (it > 0) & (
                new_rho < rho - jnp.maximum(eps, jnp.float32(1e-5))
            )
            failed = failed | diverged
            from . import warp_pallas

            domain_bad = ~warp_pallas.residual_domain_ok(
                m3, hd, wd, k=warp_k
            )
            failed = failed | domain_bad
            lam = lambda_n / jnp.where(lambda_d == 0.0, 1.0, lambda_d)
            error_proj = lam[:, None] * image_proj - template_proj
            dp = jnp.einsum("bpq,bq->bp", hessian_inv, error_proj)
            new_m = compose_fn(m, dp)
            new_m = jnp.where(failed[:, None, None], m, new_m)

            upd = (active & ~failed)[:, None, None]
            out = (
                jnp.where(upd, new_m, m),
                jnp.where(active,
                          jnp.where(failed, jnp.float32(-1.0),
                                    new_rho.astype(jnp.float32)), rho),
                jnp.where(active, rho, last_rho),
                jnp.where(active, it + 1, it),
                ok & ~(active & failed),
                esc | (active & domain_bad),
            ) + extras
            return out, None

        if use_pallas:
            # Fused TPU path: one Pallas sweep computes warp + mask +
            # Jacobian in-tile and returns only the iteration's raw Gram
            # sums; OpenCV's quantities are reconstructed from moments
            # (exact identities, see ops/ecc_pallas.py docstring).
            from . import ecc_pallas

            kw = dict(
                motion_type=motion_type, k=warp_k, tile=_ecc_tile(ws),
                quant_affine=not perspective, true_hw=(hs, ws),
                interpret=_ecc_interpret(), active=active,
            )
            if lazy:
                # Lazy-Hessian forward: the Jacobian Gram varies by
                # O(sub-pixel warp change) between iterations, so it is
                # computed on each lane's first active iteration and
                # CARRIED — the per-iteration sweep drops from 66 to 30
                # reductions (homography).  Same forward linearisation
                # and, because lambda is H-independent at the optimum
                # (both lambda_n/lambda_d scale the same way for any
                # positive-definite H there), the same fixed point; only
                # the trajectory differs by a slightly different
                # preconditioner.
                hess_c, h_ok = extras
                need_h = active & ~h_ok

                def full_fn(_):
                    mm = ecc_pallas.ecc_iteration_moments(
                        srcs, templates_f, m3, with_hessian=True, **kw
                    )
                    o = ecc_pallas.unpack_moments(mm, motion_type, True)
                    return o[:6] + o[7:], o[6]

                def lite_fn(_):
                    mm = ecc_pallas.ecc_iteration_moments(
                        srcs, templates_f, m3, with_hessian=False, **kw
                    )
                    o = ecc_pallas.unpack_moments(mm, motion_type, False)
                    return o[:6] + o[7:], jnp.zeros_like(hess_c)

                (n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti, j_i, j_m,
                 j_mt), hess_new = jax.lax.cond(
                    jnp.any(need_h), full_fn, lite_fn, None
                )
                hess_c = jnp.where(need_h[:, None, None], hess_new, hess_c)
                extras = (hess_c, h_ok | active)
                hessian = hess_c
            else:
                mom = ecc_pallas.ecc_iteration_moments(
                    srcs, templates_f, m3, with_hessian=True, **kw
                )
                (n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti,
                 hessian, j_i, j_m, j_mt) = ecc_pallas.unpack_moments(
                    mom, motion_type
                )
            n = jnp.maximum(n_raw, 1.0)
            img_mean = s_mi / n
            img_std = jnp.sqrt(jnp.maximum(s_mii / n - img_mean**2, 0.0))
            tmp_mean = s_mt / n
            tmp_std = jnp.sqrt(jnp.maximum(s_mtt / n - tmp_mean**2, 0.0))
            img_norm = jnp.sqrt(n) * img_std
            tmp_norm = jnp.sqrt(n) * tmp_std
            correlation = (
                s_mti - img_mean * s_mt - tmp_mean * s_mi
                + tmp_mean * img_mean * n_raw
            )
            image_proj = j_i - img_mean[:, None] * j_m
            template_proj = j_mt - tmp_mean[:, None] * j_m
        else:
            warped = warp_all(m3)
            image_warped = warped[:, 0]
            gxw = warped[:, 1]
            gyw = warped[:, 2]
            if pre_mask is not None:
                # user inputMask: nearest-warp the preprocessed binary
                # mask with the current warp — out-of-bounds pixels
                # land on the constant-0 border, so this subsumes the
                # validity mask (OpenCV relies on the same fact)
                if perspective:
                    warp_m = lambda mm: warp.warp_perspective(
                        pre_mask, mm, (hd, wd), border_mode="constant",
                        border_value=0.0, inverse_map=True,
                        interpolation=constants.INTER_NEAREST,
                    )
                else:
                    warp_m = lambda mm: warp.warp_affine(
                        pre_mask, mm[:2], (hd, wd),
                        border_mode="constant", border_value=0.0,
                        inverse_map=True,
                        interpolation=constants.INTER_NEAREST,
                    )
                mask = jax.vmap(warp_m)(m3)
            else:
                mask = jax.vmap(
                    lambda mm: warp.warp_valid_mask(mm, (hs, ws), (hd, wd),
                                                    inverse_map=True)
                )(m3)
            n = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)  # [B]

            def mstats(x):
                mean = jnp.sum(x * mask, axis=(1, 2)) / n
                var = jnp.sum(
                    mask * (x - mean[:, None, None]) ** 2, axis=(1, 2)
                ) / n
                return mean, jnp.sqrt(var)

            img_mean, img_std = mstats(image_warped)
            tmp_mean, tmp_std = mstats(templates_f)
            image_zm = jnp.where(
                mask > 0, image_warped - img_mean[:, None, None],
                image_warped,
            )
            template_zm = mask * (templates_f - tmp_mean[:, None, None])
            img_norm = jnp.sqrt(n) * img_std
            tmp_norm = jnp.sqrt(n) * tmp_std

            jac = _jacobian_fields_batched(motion_type, gxw, gyw, xg, yg, m3)
            jflat = jac.reshape(b, n_params, -1)
            hessian = jnp.einsum(
                "bpx,bqx->bpq", jflat, jflat, precision=_HIGHEST
            )

            izm = image_zm.reshape(b, -1)
            tzm = template_zm.reshape(b, -1)
            correlation = jnp.sum(tzm * izm, axis=1)
            image_proj = jnp.einsum(
                "bpx,bx->bp", jflat, izm, precision=_HIGHEST
            )
            template_proj = jnp.einsum(
                "bpx,bx->bp", jflat, tzm, precision=_HIGHEST
            )

        hessian_inv = jnp.linalg.inv(hessian)
        new_rho = correlation / (img_norm * tmp_norm)
        iph = jnp.einsum("bpq,bq->bp", hessian_inv, image_proj)
        lambda_n = img_norm**2 - jnp.sum(image_proj * iph, axis=1)
        lambda_d = correlation - jnp.sum(template_proj * iph, axis=1)
        failed = jnp.isnan(new_rho) | (lambda_d <= 0.0)
        if use_pallas:
            # a lane whose warp left the kernel's residual-displacement
            # domain computed garbage stats this iteration: freeze it,
            # flag failure AND mark it escalatable — the host driver
            # re-runs only these lanes at the wider band / exact XLA
            # path, warm-started from the frozen warp.  Genuine ECC
            # failures (NaN rho, lambda_d <= 0 on in-band stats) fail
            # identically in OpenCV and are NOT escalated.  A domain-bad
            # warp can also produce NaN stats, so domain_bad takes
            # precedence in the classification.
            from . import warp_pallas

            domain_bad = ~warp_pallas.residual_domain_ok(
                m3, hd, wd, k=warp_k
            )
            failed = failed | domain_bad
        else:
            domain_bad = jnp.zeros_like(failed)
        # NOTE: lazy mode deliberately carries NO rho-monotonicity
        # guard: the exact forward trajectory itself oscillates on
        # aliasing-prone content (measured: rho 0.96 -> 0.83 -> 0.85...
        # on double-resampled synthetic frames, with OpenCV returning
        # whatever iterate termination lands on), and lazy shares
        # forward's fixed point — a guard would only re-route lanes
        # through a redundant rescue.  Mode='ic' keeps its guard because
        # its fixed point is genuinely biased on such content.
        lam = lambda_n / jnp.where(lambda_d == 0.0, 1.0, lambda_d)

        # err = lam * template_zm - image_zm, so its Jacobian projection
        # is the exact linear combination — no third image-sized pass
        error_proj = lam[:, None] * template_proj - image_proj
        dp = jnp.einsum("bpq,bq->bp", hessian_inv, error_proj)
        new_m = update_fn(m, dp)
        new_m = jnp.where(failed[:, None, None], m, new_m)

        upd = (active & ~failed)[:, None, None]
        out = (
            jnp.where(upd, new_m, m),
            jnp.where(active,
                      jnp.where(failed, jnp.float32(-1.0),
                                new_rho.astype(jnp.float32)), rho),
            jnp.where(active, rho, last_rho),
            jnp.where(active, it + 1, it),
            ok & ~(active & failed),
            esc | (active & domain_bad),
        ) + extras
        return out, None

    def chunk_body(c):
        c, _ = jax.lax.scan(
            iter_body, c, None, length=_CHUNK_ITERS, unroll=_CHUNK_ITERS
        )
        return c

    def chunk_cond(c):
        m, rho, last_rho, it, ok = c[:5]
        active = (it < num_iters) & (jnp.abs(rho - last_rho) >= eps) & ok
        if slab_iters is not None:
            active = active & (it < it_slab_end)
        return jnp.any(active)

    it_slab_end = carry[3] + (slab_iters if slab_iters is not None else 0)
    return jax.lax.while_loop(chunk_cond, chunk_body, carry)


@functools.partial(jax.jit, static_argnames=("gauss_filt_size",))
def _ecc_prepare_input_jit(input_image, gauss_filt_size):
    """Input-side fields (blur + gradients) — shared by every lane
    group, computed once per burst."""
    return _input_fields(input_image, gauss_filt_size)


@functools.partial(
    jax.jit, static_argnames=("motion_type", "gauss_filt_size", "mode")
)
def _ecc_prepare_templates_jit(
    templates, gauss_filt_size, motion_type, mode="forward"
):
    """Per-group template blur + fresh solve carry."""
    templates_f = filters.gaussian_blur(
        templates.astype(jnp.float32), gauss_filt_size
    )
    n = templates_f.shape[0]
    warp0 = identity_warp(motion_type)
    carry = (
        jnp.tile(warp0[None], (n, 1, 1)),
        jnp.full((n,), -1.0, jnp.float32),
        jnp.zeros((n,), jnp.float32),  # filled with -eps by caller
        jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),  # esc: lane failed on a domain check
    )
    if mode in ("ic", "lazy"):
        p = motion_type.num_params
        carry = carry + (
            jnp.zeros((n, p, p), jnp.float32),  # carried Jacobian Gram
            jnp.zeros((n,), bool),  # h_ok: Gram computed for this lane
        )
    return templates_f, carry


@functools.partial(
    jax.jit,
    static_argnames=(
        "motion_type", "num_iters", "slab_iters", "use_pallas", "warp_k",
        "mode",
    ),
)
def _ecc_slab_jit(
    templates_f, image_f, gx, gy, carry, motion_type, num_iters, eps,
    slab_iters, use_pallas=False, warp_k=7, mode="forward", pre_mask=None,
):
    new_c = _ecc_loop_batched(
        templates_f, image_f, gx, gy, carry, motion_type, num_iters, eps,
        slab_iters, use_pallas, warp_k, mode, pre_mask,
    )
    m, rho, last_rho, it, ok = new_c[:5]
    done = (it >= num_iters) | (jnp.abs(rho - last_rho) < eps) | ~ok
    res = EccResult(rho=rho, warp_matrix=m, ok=ok, num_iters=it)
    return res, new_c, done


def default_slab_iters(
    n_lanes: int, h: int, w: int, use_pallas: bool = False
) -> int:
    """Iterations per device slab, sized so one slab stays well under the
    TPU runtime's long-program watchdog.

    The budget is PER PATH: the XLA-gather fallback runs ~4e7
    pixel-iterations/s on v5e (4e8 budget ~= 10s/slab), while the fused
    Pallas kernel measures ~2.3e9/s — sizing its slabs with the same
    budget made a 48-lane 4K slab a SINGLE iteration, paying one ~100ms
    tunnel sync per Gauss-Newton step.  6.4e9 ~= 3s/slab on the fused
    path; converged lanes skip in-kernel, so overshoot past convergence
    drains at negligible device cost."""
    import os

    override = os.environ.get("LIBSTACKER_ECC_SLAB_ITERS")
    if override:
        return max(1, int(override))
    budget = int(6.4e9) if use_pallas else int(4e8)
    per_iter = max(1, n_lanes * h * w)
    return max(1, min(512, budget // per_iter))


def _rescale_warp_batch(
    warps: jnp.ndarray, motion_type: MotionType, s: float
) -> jnp.ndarray:
    """Upscale warp matrices estimated on a 1/s-scale grid to full scale
    (translation column scales; homography perspective row divides —
    same math as the reference's scale-down adjustment,
    src/lib.rs:941-958)."""
    w = warps.at[..., 0, 2].mul(s).at[..., 1, 2].mul(s)
    if motion_type == MotionType.Homography:
        w = w.at[..., 2, 0].divide(s).at[..., 2, 1].divide(s)
    return w


@functools.partial(jax.jit, static_argnames=("dh", "dw"))
def _resize_area_jit(x: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """Jitted INTER_AREA resize for the coarse-to-fine octaves.

    Exact 2x reductions of even extents (every octave step at even
    dims) are a 2x2 box mean — INTER_AREA's weights for an integer 2x
    ratio are exactly uniform 1/4 — computed as one reshape-mean at HBM
    bandwidth instead of two banded matmuls (~2.8 ms/frame at 4K).
    Everything else (odd extents) takes the exact banded-resize path;
    under jit XLA fuses its shifted-slice operands instead of
    materialising the [nblk, L, ...] stack an eager call pays."""
    h, w = x.shape[-2], x.shape[-1]
    if h == 2 * dh and w == 2 * dw:
        x4 = x.reshape(*x.shape[:-2], dh, 2, dw, 2)
        return (x4[..., 0, :, 0] + x4[..., 0, :, 1]
                + x4[..., 1, :, 0] + x4[..., 1, :, 1]) * jnp.float32(0.25)
    from . import resize as _resize

    return _resize.resize(x, (dh, dw), constants.INTER_AREA)


def _resize_batch_chunked(x: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """Lane-chunked jitted resize of a [N,H,W] burst: bounds the jitted
    program's transients (~4 HW-sized f32 buffers per lane) so a 100x4K
    octave build cannot exhaust HBM."""
    n, h, w = x.shape
    if h == 2 * dh and w == 2 * dw:
        # box-mean path: one fused bandwidth-bound reduce, no HW-sized
        # transients to bound
        return _resize_area_jit(x, dh, dw)
    chunk = max(1, int(1.5e9) // (h * w * 16))
    if chunk >= n:
        return _resize_area_jit(x, dh, dw)
    return jnp.concatenate([
        _resize_area_jit(x[i : i + chunk], dh, dw)
        for i in range(0, n, chunk)
    ])


def _solve_octave_nosync(
    templates: jnp.ndarray,
    input_image: jnp.ndarray,
    motion_type: MotionType,
    num_iters: int,
    eps: float,
    gauss_filt_size: int,
    warp_init: Optional[jnp.ndarray],
    mode: str,
    input_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused-kernel octave solve with NO host synchronisation: dispatch
    one slab per lane group (async) and return ``(warp_matrix, rho,
    ok)`` device arrays for the next level's warm start.

    Octave solves only SEED the finer level, so the exact driver's
    convergence machinery is deliberately skipped: no done-flag fetch
    (the one host sync per drive round), no k-escalation ladder, no XLA
    rescue.  The single slab's iteration budget
    (:func:`default_slab_iters`, >=60 at octave geometries) covers
    typical eps convergence (2-8 iterations) many times over; converged
    lanes skip in-kernel so the overshoot is nearly free on device.  A
    lane that leaves the base residual band or genuinely fails freezes
    at its last good iterate — a partial but still useful warm start —
    and the full-resolution solve owns the exact verdict.
    LIBSTACKER_COARSE_SYNC=1 restores the exact per-octave driver (A/B
    knob).  Disabled for mode='ic' (its divergence guard needs the
    rescue restart to produce meaningful iterates on aliased content).
    """
    n, h, w = templates.shape
    if n == 0:
        # empty lane set (a 1-frame burst's frames[1:] with
        # coarse_levels>0): mirror the main entry's n==0 branch instead
        # of hitting jnp.concatenate([]) below
        r = 3 if motion_type == MotionType.Homography else 2
        return (
            jnp.zeros((0, r, 3), jnp.float32),
            jnp.zeros((0,), jnp.float32),
            jnp.zeros((0,), bool),
        )
    pre_mask = None
    if input_mask is not None:
        image_f, gx, gy, pre_mask = _ecc_prepare_input_masked_jit(
            input_image, input_mask, gauss_filt_size
        )
    else:
        image_f, gx, gy = _ecc_prepare_input_jit(
            input_image, gauss_filt_size
        )
    env_k = _ecc_warp_k()
    warp_k = env_k if env_k is not None else _K_LADDER[0]
    group_n = min(
        _MAX_SOLVE_LANES, max(1, int(4e8) // max(1, 4 * h * w))
    )
    outs = []
    for s0 in range(0, n, group_n):
        e0 = min(s0 + group_n, n)
        templates_f, carry = _ecc_prepare_templates_jit(
            templates[s0:e0], gauss_filt_size, motion_type, mode
        )
        if warp_init is not None:
            carry = (
                jnp.asarray(warp_init[s0:e0], jnp.float32),
            ) + carry[1:]
        carry = (carry[0], carry[1], carry[2] - eps) + carry[3:]
        m0 = carry[0]
        si = default_slab_iters(e0 - s0, h, w, use_pallas=True)
        res, _, _ = _ecc_slab_jit(
            templates_f, image_f, gx, gy, carry, motion_type, num_iters,
            eps, si, use_pallas=True, warp_k=warp_k, mode=mode,
            pre_mask=pre_mask,
        )
        if mode == "lazy":
            # no rescue pass here: a lane the divergence guard froze
            # holds a mid-divergence iterate, which is NOT a meaningful
            # warm start (same rationale as the synced driver's rescue
            # restart) — hand the finer level the pre-solve init instead
            res = res._replace(
                warp_matrix=jnp.where(
                    res.ok[:, None, None], res.warp_matrix, m0
                )
            )
        outs.append(res)
    if len(outs) == 1:
        return outs[0].warp_matrix, outs[0].rho, outs[0].ok
    return (
        jnp.concatenate([r.warp_matrix for r in outs]),
        jnp.concatenate([r.rho for r in outs]),
        jnp.concatenate([r.ok for r in outs]),
    )


def find_transform_ecc_batched(
    templates: jnp.ndarray,
    input_image: jnp.ndarray,
    motion_type: MotionType = MotionType.Affine,
    num_iters: int = 200,
    eps: float = -1.0,
    gauss_filt_size: int = 5,
    slab_iters: Optional[int] = None,
    coarse_levels: int = 0,
    warp_init: Optional[jnp.ndarray] = None,
    mode: Optional[str] = None,
    input_mask: Optional[jnp.ndarray] = None,
    rho_init: Optional[jnp.ndarray] = None,
) -> EccResult:
    """Batched ECC: estimate one warp per template frame against a shared
    input image (the reference's per-thread ``find_transform_ecc`` calls
    at src/lib.rs:769-777 collapsed into one vmapped program).

    ``rho_init`` ([N] f32, internal — the coarse-to-fine driver) seeds
    each lane's ``last_rho`` with the previous octave's converged
    correlation, so OpenCV's |d rho| < eps stopping rule is applied
    ACROSS the scale change: a lane whose first iteration here measures
    the same rho its octave converged at stops after that one polishing
    iteration.  Lanes marked -1 (no trustworthy octave rho) keep the
    cold start.  Ignored when eps <= 0 or mode='ic' (its divergence
    guard compares against the running rho).

    Host-level driver: the Gauss-Newton solve runs as a sequence of
    bounded device slabs so no single program can trip the TPU runtime
    watchdog, with convergence checked between slabs.

    ``coarse_levels`` > 0 enables coarse-to-fine solving (a capability
    beyond OpenCV's findTransformECC): the warp is first estimated on
    2x-downscaled octaves, then refined at full resolution from that
    init — same converged warp, a fraction of the full-res iterations.

    ``mode``: 'forward' (OpenCV's forward-additive formulation,
    bit-faithful reconstruction — the default) or 'ic'
    (inverse-compositional: the template-side Jacobian Gram is computed
    once per lane and carried, making each fused-kernel iteration ~40%
    cheaper; converges to the same correlation optimum within the eps
    tolerance).  ``None`` resolves via LIBSTACKER_ECC_MODE.  The XLA
    fallback/rescue path always runs the exact forward formulation.

    ``input_mask`` ([H,W], nonzero = valid) is cv2.findTransformECC's
    ``inputMask``: pixels of ``input_image`` excluded from the
    correlation (moving subjects, dead sensor regions).  Semantics
    match ecc.cpp exactly — the mask is binarised, blurred with
    ``gauss_filt_size`` and re-thresholded at 0.95, the input
    gradients are pre-multiplied by it, and every iteration
    nearest-warps it in place of the all-ones validity mask.  On TPU
    the mask rides the fused iteration kernel as a 4th source plane
    (forward/lazy modes; 'ic' falls back to forward), so masked solves
    keep kernel speed; the XLA fallback/rescue path applies the same
    semantics with an explicit nearest mask warp.
    """
    if mode is None:
        mode = _ecc_mode_default()
    if mode not in _ECC_MODES:
        raise ValueError(f"mode must be one of {_ECC_MODES}, got {mode!r}")
    if input_mask is not None and mode == "ic":
        # the IC kernel linearises the template side and has no mask
        # operand; masked solves run the exact forward formulation
        mode = "forward"
    if coarse_levels > 0:
        import os as _os
        import sys as _sys
        import time as _time

        _prof = bool(_os.environ.get("LIBSTACKER_ECC_PROFILE"))

        def _mark(label, *arrays):
            if not _prof:
                return
            for a in arrays:
                jax.block_until_ready(a)
            _sys.stderr.write(
                f"[ecc-profile] {label}: {_time.perf_counter() - _t0:.3f}s\n"
            )

        _t0 = _time.perf_counter() if _prof else 0.0
        n, h, w = templates.shape
        # Octave pyramid by CASCADED 2x INTER_AREA reductions, shallow
        # (s=2) -> deep: each level resizes the previous one (4x
        # cheaper per level than re-resizing the full-res burst, exact
        # for even extents and sub-LSB different otherwise — the
        # octaves only seed the next level's warm start).  The burst
        # resize is jitted and lane-chunked: an EAGER banded resize of
        # a 100x4K burst materialises its [nblk, L, N, W] slice stack
        # (~3.5 GB) and OOMs a v5e (measured, ROADMAP.md).
        levels = [
            lvl for lvl in range(1, coarse_levels + 1)
            if min(h, w) // 2 ** lvl >= 64
        ]
        octaves = {}
        tl, il = templates, input_image
        ml = (
            None if input_mask is None
            else (jnp.asarray(input_mask) > 0).astype(jnp.float32)
        )
        for lvl in range(1, (max(levels) + 1) if levels else 1):
            s = 2 ** lvl
            dh, dw = h // s, w // s
            tl = _resize_batch_chunked(tl, dh, dw)
            il = _resize_area_jit(il, dh, dw)
            if ml is not None:
                ml = _resize_area_jit(ml, dh, dw)
            if lvl in levels:
                # conservative mask downscale: a coarse pixel is valid
                # only if >= half its INTER_AREA footprint was
                octaves[lvl] = (tl, il, None if ml is None else ml >= 0.5)
        _mark("octave build", *(tl for (tl, _, _) in octaves.values()))
        init = warp_init
        init_at_full_scale = warp_init is not None
        # Octave solves only seed the finer level's warm start, so they
        # may run to a looser tolerance than the user's eps (the
        # full-resolution solve below always uses the exact criteria).
        # LIBSTACKER_COARSE_EPS_MULT tunes the factor (hardware A/B).
        eps_oct = eps
        if eps > 0:
            eps_oct = eps * float(
                _os.environ.get("LIBSTACKER_COARSE_EPS_MULT", "1")
            )
        rho_seed = None
        for lvl in sorted(octaves, reverse=True):
            s = 2 ** lvl
            tl, il, mlv = octaves[lvl]
            if init_at_full_scale:
                # the caller's warp_init (e.g. the phase-correlation
                # warm start) is in full-resolution pixels; bring it to
                # the first actually-solved octave's grid (levels after
                # this one are handled by the 2.0 rescale below)
                init = _rescale_warp_batch(init, motion_type, 1.0 / s)
                init_at_full_scale = False
            hl, wl = int(tl.shape[1]), int(tl.shape[2])
            nosync = (
                _pallas_ok(hl, wl)
                and tuple(il.shape) == (hl, wl)
                and mode in ("forward", "lazy")
                and _os.environ.get("LIBSTACKER_COARSE_SYNC", "0")
                in ("", "0")
            )
            if nosync:
                # Speculative chained dispatch: the octave result is
                # consumed only ON DEVICE (as the next level's warm
                # start), so the exact driver's done-flag fetch, k
                # ladder and rescue pass are pure overhead here — a
                # ~100ms tunnel sync round of device idle per level
                # (measured: the 1080p octave of the 100x4K headline
                # cost 0.70s against a ~0.34s device floor).  One slab
                # per lane group at the ladder's base band covers
                # typical eps convergence many times over; a lane that
                # leaves the band or runs past the slab freezes at its
                # last in-band iterate, which still warm-starts the
                # finer level, and the full-resolution solve below owns
                # the exact verdict (its own ladder + XLA rescue).
                wm, rho_o, ok_o = _solve_octave_nosync(
                    tl, il, motion_type, num_iters, eps_oct,
                    gauss_filt_size, init, mode, mlv,
                )
                _mark(f"octave 1/{s} solve dispatched (nosync)")
            else:
                res = find_transform_ecc_batched(
                    tl, il, motion_type, num_iters, eps_oct,
                    gauss_filt_size, slab_iters=None, coarse_levels=0,
                    warp_init=init, mode=mode, input_mask=mlv,
                )
                wm, rho_o, ok_o = res.warp_matrix, res.rho, res.ok
                if _prof:
                    import numpy as _np

                    it = _np.asarray(res.num_iters)
                    _mark(
                        f"octave 1/{s} solve (iters mean {it.mean():.1f} "
                        f"max {it.max()})",
                        res.warp_matrix, res.ok,
                    )
            init = _rescale_warp_batch(wm, motion_type, 2.0)
            # cross-scale rho seed for the next level's convergence
            # test: a lane whose octave solve converged hands its final
            # correlation down — if the finer level's first iteration
            # measures the same rho (|d rho| < eps, OpenCV's own
            # criterion applied across the scale change), the lane
            # stops after ONE polishing iteration instead of paying a
            # second confirm sweep.  Lanes without a trustworthy octave
            # rho (failed/frozen) keep the default cold start.
            rho_seed = jnp.where(
                ok_o & (rho_o > -1.0), rho_o, jnp.float32(-1.0)
            )
        if _os.environ.get("LIBSTACKER_COARSE_RHO_SEED", "1") == "0":
            rho_seed = None
        out = find_transform_ecc_batched(
            templates, input_image, motion_type, num_iters, eps,
            gauss_filt_size, slab_iters=slab_iters, coarse_levels=0,
            warp_init=init, mode=mode, input_mask=input_mask,
            rho_init=rho_seed,
        )
        _mark("full-res solve", out.warp_matrix, out.ok)
        return out

    n, h, w = templates.shape
    if n == 0:
        # empty lane set (e.g. a 1-frame burst's frames[1:]): nothing to
        # solve — return empty, well-shaped results instead of tracing a
        # zero-lane program
        r = 3 if motion_type == MotionType.Homography else 2
        return EccResult(
            rho=jnp.zeros((0,), jnp.float32),
            warp_matrix=jnp.zeros((0, r, 3), jnp.float32),
            ok=jnp.zeros((0,), bool),
            num_iters=jnp.zeros((0,), jnp.int32),
        )
    # Lane grouping: each group is one bounded device program per slab
    # (watchdog), sized so a slab covers >= ~4 GN iterations; the fused
    # kernel's SMEM moment accumulator also caps a group at
    # _MAX_SOLVE_LANES.  ALL groups' slab loops are driven interleaved:
    # every dispatch is async, so a whole round of slabs across every
    # group costs ONE host sync (the dev tunnel's ~100 ms RTT per sync
    # made the r2 per-chunk serial driver the headline bottleneck).
    group_n = min(
        _MAX_SOLVE_LANES, max(1, int(4e8) // max(1, 4 * h * w))
    )
    pre_mask = None
    if input_mask is not None:
        input_mask = jnp.asarray(input_mask)
        if input_mask.shape != input_image.shape:
            raise ValueError(
                f"input_mask shape {input_mask.shape} must match "
                f"input_image shape {input_image.shape}"
            )
        image_f, gx, gy, pre_mask = _ecc_prepare_input_masked_jit(
            input_image, input_mask, gauss_filt_size
        )
    else:
        image_f, gx, gy = _ecc_prepare_input_jit(
            input_image, gauss_filt_size
        )

    class _Group:
        __slots__ = ("templates_f", "carry", "slab_iters",
                     "slab_iters_pallas", "res", "done", "all_ok", "m_init")

    groups = []
    for s0 in range(0, n, group_n):
        e0 = min(s0 + group_n, n)
        g = _Group()
        g.templates_f, carry = _ecc_prepare_templates_jit(
            templates[s0:e0], gauss_filt_size, motion_type, mode
        )
        if warp_init is not None:
            carry = (
                jnp.asarray(warp_init[s0:e0], jnp.float32),
            ) + carry[1:]
        g.m_init = carry[0]
        if rho_init is not None and eps > 0 and mode in ("forward", "lazy"):
            r0 = jnp.asarray(rho_init[s0:e0], jnp.float32)
            valid = r0 > -1.0
            # seeded lanes: rho = octave rho, last_rho 2*eps below it so
            # the first iteration always runs; unseeded lanes keep the
            # (-1, 0) cold start (the -eps shift below applies to both)
            carry = (
                carry[0],
                jnp.where(valid, r0, carry[1]),
                jnp.where(valid, r0 - jnp.float32(eps), carry[2]),
            ) + carry[3:]
        g.carry = (carry[0], carry[1], carry[2] - eps) + carry[3:]
        g.slab_iters = (
            slab_iters if slab_iters is not None
            else default_slab_iters(e0 - s0, h, w)
        )
        g.slab_iters_pallas = (
            slab_iters if slab_iters is not None
            else default_slab_iters(e0 - s0, h, w, use_pallas=True)
        )
        g.res = g.done = None
        g.all_ok = False
        groups.append(g)

    def drive(indices, use_pallas: bool, warp_k: int = 7):
        """Run every listed group's slab loop to completion.  Per round:
        dispatch ``disp`` slabs for each pending group back-to-back
        (async), then fetch ALL groups' done/ok flags in one transfer.
        ``disp`` grows geometrically — a drained (all-lanes-inactive)
        slab program is nearly free on device, so overshooting beats
        extra syncs."""
        pend = list(indices)
        disp = 1
        rounds = 0
        while pend:
            rounds += 1
            flag_rows = []
            for gi in pend:
                g = groups[gi]
                si = g.slab_iters_pallas if use_pallas else g.slab_iters
                for _ in range(disp):
                    g.res, g.carry, g.done = _ecc_slab_jit(
                        g.templates_f, image_f, gx, gy, g.carry,
                        motion_type, num_iters, eps, si,
                        use_pallas=use_pallas, warp_k=warp_k, mode=mode,
                        pre_mask=pre_mask,
                    )
                flag_rows.append(
                    jnp.stack([jnp.all(g.done), jnp.all(g.res.ok)])
                )
            flags = jax.device_get(jnp.stack(flag_rows))
            nxt = []
            for row, gi in zip(flags, pend):
                groups[gi].all_ok = bool(row[1])
                if not bool(row[0]):
                    nxt.append(gi)
            pend = nxt
            disp = min(disp * 2, 8)
        if _ECC_PROFILE:
            import sys as _sys

            _sys.stderr.write(
                f"[ecc-profile] drive({h}x{w}, pallas={use_pallas}, "
                f"k={warp_k}): {rounds} sync rounds\n"
            )

    # Adaptive kernel band: the fused kernel's tap loop is O((2k+4)^2),
    # so try the small band first and escalate — a lane flagged by the
    # in-loop residual-domain check re-runs at the wider band,
    # warm-started from its frozen warp and alone (converged lanes stay
    # masked out).  After the ladder, ANY remaining failed lane —
    # domain-escaped or a genuine ECC failure (NaN rho /
    # lambda_d <= 0) — is re-run once on the exact XLA-gather path:
    # genuine failures usually fail identically in OpenCV, but the
    # fused kernel reconstructs its statistics from f32 moment sums
    # whose cancellation can differ from the exact path's, so the final
    # verdict belongs to the reference formulation.
    use_pallas = _pallas_ok(h, w) and tuple(input_image.shape) == (h, w)
    all_idx = list(range(len(groups)))
    if not use_pallas:
        drive(all_idx, False)
    else:
        env_k = _ecc_warp_k()
        ladder = (env_k,) if env_k is not None else _K_LADDER
        remaining = all_idx
        for ki, k in enumerate(ladder):
            drive(remaining, True, k)
            maybe = [gi for gi in remaining if not groups[gi].all_ok]
            if not maybe or ki + 1 == len(ladder):
                break
            # only domain-escaped lanes climb the ladder (genuine
            # failures wait for the final XLA sweep below)
            esc_any = jax.device_get(
                jnp.stack(
                    [jnp.any(groups[gi].carry[5] & ~groups[gi].carry[4])
                     for gi in maybe]
                )
            )
            remaining = []
            for gi, ea in zip(maybe, esc_any):
                if bool(ea):
                    groups[gi].carry = _reactivate_carry(
                        groups[gi].carry, eps,
                        groups[gi].carry[5] & ~groups[gi].carry[4],
                    )
                    remaining.append(gi)
            if not remaining:
                break
        rescue = [gi for gi in all_idx if not groups[gi].all_ok]
        if rescue:
            for gi in rescue:
                g = groups[gi]
                bad = ~g.carry[4]
                if mode in ("ic", "lazy"):
                    # a lane the divergence guard froze holds a
                    # mid-divergence iterate, not a meaningful warm
                    # start: restart the exact forward rescue from the
                    # ORIGINAL init so ic/lazy verdicts on pathological
                    # lanes match forward-mode (and OpenCV's) verdicts
                    g.carry = (
                        jnp.where(bad[:, None, None], g.m_init, g.carry[0]),
                    ) + g.carry[1:]
                g.carry = _reactivate_carry(g.carry, eps, bad)
            drive(rescue, False)

    return EccResult(
        rho=jnp.concatenate([g.res.rho for g in groups]),
        warp_matrix=jnp.concatenate([g.res.warp_matrix for g in groups]),
        ok=jnp.concatenate([g.res.ok for g in groups]),
        num_iters=jnp.concatenate([g.res.num_iters for g in groups]),
    )


def _pallas_ok(h: int, w: int) -> bool:
    """Use the fused Pallas iteration kernel on TPU when the image fits
    its window (small images and CPU keep the XLA-gather path).
    LIBSTACKER_FORCE_PALLAS=1 forces it on CPU (interpret-mode tests,
    with LIBSTACKER_ECC_INTERPRET=1)."""
    import os

    if os.environ.get("LIBSTACKER_DISABLE_PALLAS"):
        return False
    if os.environ.get("LIBSTACKER_FORCE_PALLAS"):
        return h >= 160 and w >= 384
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and h >= 160 and w >= 384


def _ecc_interpret() -> bool:
    """Interpret-mode switch for the fused iteration kernel (CPU CI)."""
    import os

    return bool(os.environ.get("LIBSTACKER_ECC_INTERPRET"))


def _ecc_tile(ws: Optional[int] = None):
    """Fused-kernel tile shape, overridable as LIBSTACKER_ECC_TILE=RxC
    (rows % 8 == 0, cols % 128 == 0) for hardware sweeps.

    Default (128, 256): the 2026-08-19 end-to-end headline A/B
    (ROADMAP.md) — 256-wide columns amortise the window DMA ~20%
    per lane-iteration without shrinking the per-axis residual band
    enough to escalate +-0.6 deg rotation lanes (384+ cols do;
    (64,512) collapses the headline 37 -> 26 fps).  ``ws`` is the
    source image width: the 256-column tile's window needs a padded
    width >= 512 (tile + 2x128 lane halo), so narrower images clamp
    back to 128 columns (the _pallas_ok floor).  Explicit env
    overrides are never clamped."""
    import os

    v = os.environ.get("LIBSTACKER_ECC_TILE")
    if not v:
        if ws is not None and ((ws + 127) // 128) * 128 < 512:
            return (128, 128)
        return (128, 256)
    try:
        r, c = (int(x) for x in v.lower().split("x"))
    except ValueError:
        raise ValueError(
            f"LIBSTACKER_ECC_TILE must look like '128x512', got {v!r}"
        ) from None
    if r % 8 or c % 128 or r <= 0 or c <= 0:
        raise ValueError(
            f"LIBSTACKER_ECC_TILE rows must be multiples of 8 and cols "
            f"of 128, got {v!r}"
        )
    return (r, c)
