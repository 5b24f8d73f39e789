"""Fused ECC Gauss-Newton iteration kernel (Pallas TPU).

The batched ECC engine's per-iteration cost (ops/ecc.py,
``_ecc_loop_batched``) was dominated by HBM traffic, not FLOPs: the
warp kernel wrote [B,3,H,W] warped fields, a mask pass and two stats
passes re-read them, the Jacobian stack materialised [B,P,H,W]
(~1 GB at 4K x 4 lanes x 8 params) and three MXU projections re-read
it.  This kernel collapses the whole iteration into ONE pass over the
image: per (lane, tile) grid step it

- DMAs the three shared source windows (image, gx, gy) exactly like
  ops/warp_pallas (window origin follows the warp, dynamic rolls
  re-align, static tap loop — same 1/32-px OpenCV quantisation),
- computes the warped image/gradient tile, the INTER_NEAREST validity
  mask and the motion-model Jacobian fields in registers,
- reduces everything to the iteration's sufficient statistics — raw
  Gram sums — accumulated into a tiny per-lane SMEM vector:

    [ n, S(m*i), S(m*i^2), S(m*t), S(m*t^2), S(m*t*i),
      S(jac_p*i) (P), S(jac_p*m) (P), S(jac_p*m*t) (P)
      [, H_pq upper tri (P(P+1)/2) when with_hessian] ]

  (66 scalars for homography; 30 in the lazy-Hessian mode that carries
  H across iterations — see ops/ecc.py mode='lazy').  Nothing
  image-sized ever returns to
  HBM; per iteration the only HBM traffic is the 3 source windows and
  the streamed template tiles.

The host-side math (ops/ecc.py) reconstructs OpenCV's quantities
exactly from these moments:

    image_zm      = imw - imgMean * mask        (border pixels keep imw)
    template_zm   = mask * (tmpl - tmpMean)
    correlation   = S(mti) - iMean*S(mt) - tMean*S(mi) + tMean*iMean*n
    image_proj_p  = S(jac_p * i) - iMean * S(jac_p * m)
    template_proj = S(jac_p*m*t) - tMean * S(jac_p * m)
    error_proj    = lambda * template_proj - image_proj   (exact identity)

matching cv2 findTransformECC's update (reference hot loop:
/root/reference/src/lib.rs:769-777) to f32 reduction order.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import MotionType
from .warp_pallas import compute_source_coords, compute_window_origin


def moments_layout(
    motion_type: MotionType, with_hessian: bool = True
) -> Tuple[int, int]:
    """(n_params, n_out) for the moments vector of a motion model.
    ``with_hessian=False`` drops the Jacobian-Gram upper triangle (the
    lazy-Hessian forward mode carries H instead of recomputing it)."""
    p = motion_type.num_params
    n = 6 + 3 * p
    if with_hessian:
        n += p * (p + 1) // 2
    return p, n


def _jac_tile_fields(motion_type, gxw, gyw, xs, ys, sx, sy, inv_den, m):
    """Per-tile Jacobian fields [P x (th,tw)], matching OpenCV's
    image_jacobian_*_ECC (see ops/ecc.py _jacobian_fields; ``sx``/``sy``
    are the warped coordinates = OpenCV's hatX/hatY)."""
    if motion_type == MotionType.Translation:
        return [gxw, gyw]
    if motion_type == MotionType.Euclidean:
        h0 = m[0]  # cos(theta) = m3[0,0]
        h1 = m[3]  # sin(theta) = m3[1,0]
        hat_x = -xs * h1 - ys * h0
        hat_y = xs * h0 - ys * h1
        return [gxw * hat_x + gyw * hat_y, gxw, gyw]
    if motion_type == MotionType.Affine:
        return [gxw * xs, gyw * xs, gxw * ys, gyw * ys, gxw, gyw]
    # Homography: hatX = sx, hatY = sy (identical den, m[2,2] == 1)
    gxd = gxw * inv_den
    gyd = gyw * inv_den
    tmp = sx * gxd + sy * gyd
    return [gxd * xs, gyd * xs, -tmp * xs, gxd * ys, gyd * ys, -tmp * ys,
            gxd, gyd]


def _moments_kernel(
    m_ref,  # SMEM [B, 12]
    srcs_ref,  # ANY [3|4, Hp, Wp] (image, gx, gy[, pre-mask])
    tmpl_ref,  # VMEM [1, TH, TW] (this lane's template tile)
    out_ref,  # SMEM [B, n_out] moment accumulators (full tiny array)
    scratch,  # VMEM [3|4, WH, WW]
    sem,  # DMA semaphores [3|4]
    *,
    n_src: int,
    th: int,
    tw: int,
    k: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    motion_type: MotionType,
    quant_affine: bool,
    n_out: int,
    with_hessian: bool,
):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    y0 = ti * th
    x0 = tj * tw

    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256

    # the whole (tiny) [B, n_out] accumulator array is one SMEM block
    # revisited by every grid step: zero it once at the very first step
    first = (b == 0) & (ti == 0) & (tj == 0)

    @pl.when(first)
    def _():
        # SMEM accepts scalar stores only; B * n_out is tiny and this
        # runs once per kernel launch
        for bb in range(out_ref.shape[0]):
            for idx in range(n_out):
                out_ref[bb, idx] = jnp.float32(0.0)

    # converged/failed lanes are frozen by the GN loop's masking — skip
    # their grid steps entirely (their zero moments yield NaN rho, which
    # the loop ignores for inactive lanes); lanes finish at different
    # iteration counts, so this trims the whole convergence tail
    lane_active = m_ref[b, 9] != 0.0

    @pl.when(lane_active)
    def _lane():
        _moments_tile_body(
            m_ref, srcs_ref, tmpl_ref, out_ref, scratch, sem,
            b=b, ti=ti, tj=tj, y0=y0, x0=x0, wh=wh, ww=ww,
            th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
            motion_type=motion_type, quant_affine=quant_affine,
            n_out=n_out, with_hessian=with_hessian, n_src=n_src,
        )


def _moments_tile_body(
    m_ref, srcs_ref, tmpl_ref, out_ref, scratch, sem,
    *, b, ti, tj, y0, x0, wh, ww, th, tw, k, h, w, hp, wp,
    motion_type, quant_affine, n_out, with_hessian, n_src,
):
    m = [m_ref[b, i] for i in range(9)]
    r0, c0, r0_ideal, c0_ideal = compute_window_origin(
        m, ti, tj, th=th, tw=tw, k=k, hp=hp, wp=wp
    )
    copies = [
        pltpu.make_async_copy(
            srcs_ref.at[c, pl.ds(r0, wh), pl.ds(c0, ww)],
            scratch.at[c],
            sem.at[c],
        )
        for c in range(n_src)
    ]
    for cp in copies:
        cp.start()

    sx, sy, fx0, fy0, fx, fy = compute_source_coords(
        m, y0, x0, th=th, tw=tw, quant_affine=quant_affine
    )

    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    ys = (y0 + iy).astype(jnp.float32)
    xs = (x0 + ix).astype(jnp.float32)
    # ragged edge tiles: output pixels beyond the true image must not
    # contribute to any sum
    valid = ((y0 + iy < h) & (x0 + ix < w)).astype(jnp.float32)
    # INTER_NEAREST validity mask (ops/warp.py warp_valid_mask semantics:
    # round the UN-quantised coordinate)
    xi = jnp.round(sx)
    yi = jnp.round(sy)
    mask = (
        (xi >= 0.0) & (xi <= w - 1.0) & (yi >= 0.0) & (yi <= h - 1.0)
    ).astype(jnp.float32) * valid

    sy_rel = fy0.astype(jnp.int32) - r0_ideal - iy
    sx_rel = fx0.astype(jnp.int32) - c0_ideal - ix
    vx0 = ((fx0 >= 0.0) & (fx0 <= w - 1.0)).astype(jnp.float32)
    vx1 = ((fx0 >= -1.0) & (fx0 <= w - 2.0)).astype(jnp.float32)
    vy0 = ((fy0 >= 0.0) & (fy0 <= h - 1.0)).astype(jnp.float32)
    vy1 = ((fy0 >= -1.0) & (fy0 <= h - 2.0)).astype(jnp.float32)
    n_taps = 2 * k + 3
    wx_list = [
        (1.0 - fx) * vx0 * (sx_rel == t) + fx * vx1 * (sx_rel == t - 1)
        for t in range(0, n_taps + 1)
    ]

    if n_src == 4:
        # user inputMask (4th source plane): its INTER_NEAREST tap
        # replaces the all-ones mask.  The nearest index round(s) lands
        # in {floor(s_quantised), floor+1} (quantisation error <= 1/64,
        # round <= floor+1), so the one-hot selectors stay inside the
        # existing tap range and window extent.
        ny_rel = yi.astype(jnp.int32) - r0_ideal - iy
        nx_rel = xi.astype(jnp.int32) - c0_ideal - ix
        wxn_list = [
            (nx_rel == t).astype(jnp.float32) for t in range(0, n_taps + 1)
        ]

    for cp in copies:
        cp.wait()
    roll_r = jnp.mod(r0 - r0_ideal, wh)
    roll_c = jnp.mod(c0 - c0_ideal, ww)
    wins = [scratch[c] for c in range(n_src)]
    wins = [pltpu.roll(wv, roll_r, 0) for wv in wins]
    wins = [pltpu.roll(wv, roll_c, 1) for wv in wins]

    # fused 3-source bilinear warp (one weight set, three accumulators)
    # plus, when masked, the nearest-tap sweep of the mask plane
    imw = jnp.zeros((th, tw), jnp.float32)
    gxw = jnp.zeros((th, tw), jnp.float32)
    gyw = jnp.zeros((th, tw), jnp.float32)
    mtap = jnp.zeros((th, tw), jnp.float32)
    for ss in range(0, n_taps + 1):
        w_s = (1.0 - fy) * vy0 * (sy_rel == ss) + fy * vy1 * (sy_rel == ss - 1)
        t_i = jnp.zeros((th, tw), jnp.float32)
        t_gx = jnp.zeros((th, tw), jnp.float32)
        t_gy = jnp.zeros((th, tw), jnp.float32)
        for tt, wx in enumerate(wx_list):
            t_i = t_i + wx * wins[0][ss : ss + th, tt : tt + tw]
            t_gx = t_gx + wx * wins[1][ss : ss + th, tt : tt + tw]
            t_gy = t_gy + wx * wins[2][ss : ss + th, tt : tt + tw]
        imw = imw + w_s * t_i
        gxw = gxw + w_s * t_gx
        gyw = gyw + w_s * t_gy
        if n_src == 4:
            w_sn = (ny_rel == ss).astype(jnp.float32)
            t_m = jnp.zeros((th, tw), jnp.float32)
            for tt, wxn in enumerate(wxn_list):
                t_m = t_m + wxn * wins[3][ss : ss + th, tt : tt + tw]
            mtap = mtap + w_sn * t_m
    if n_src == 4:
        mask = mask * mtap

    # zero every field at invalid output pixels (every sum below has a
    # gxw/gyw/mask factor, so this suffices; imw's unmasked boundary
    # values stay intact inside the image, matching OpenCV)
    gxw = gxw * valid
    gyw = gyw * valid
    tmpl = jnp.where(valid > 0, tmpl_ref[0], 0.0)

    if motion_type == MotionType.Homography:
        den = m[6] * xs + m[7] * ys + 1.0
        inv_den = 1.0 / den
    else:
        inv_den = None
    jac = _jac_tile_fields(
        motion_type, gxw, gyw, xs, ys, sx, sy, inv_den, m
    )
    p = len(jac)

    mi = mask * imw
    mt = mask * tmpl
    partials = [
        jnp.sum(mask),
        jnp.sum(mi),
        jnp.sum(mi * imw),
        jnp.sum(mt),
        jnp.sum(mt * tmpl),
        jnp.sum(mt * imw),
    ]
    for a in range(p):
        partials.append(jnp.sum(jac[a] * imw))
    for a in range(p):
        partials.append(jnp.sum(jac[a] * mask))
    for a in range(p):
        partials.append(jnp.sum(jac[a] * mt))
    if with_hessian:
        for a in range(p):
            for bq in range(a, p):
                partials.append(jnp.sum(jac[a] * jac[bq]))
    assert len(partials) == n_out

    for idx, val in enumerate(partials):
        out_ref[b, idx] += val


@functools.partial(
    jax.jit,
    static_argnames=(
        "motion_type", "k", "tile", "quant_affine", "interpret", "true_hw",
        "with_hessian",
    ),
)
def ecc_iteration_moments(
    srcs: jnp.ndarray,  # [3|4, Hp, Wp] f32 (image, gx, gy[, pre-mask])
    templates: jnp.ndarray,  # [B, H, W] f32
    m3: jnp.ndarray,  # [B, 3, 3] warp matrices (inverse-map convention)
    motion_type: MotionType,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
    true_hw: Optional[Tuple[int, int]] = None,
    active: Optional[jnp.ndarray] = None,
    with_hessian: bool = True,
) -> jnp.ndarray:
    """One fused ECC iteration sweep -> [B, n_out] raw moments.

    ``srcs`` must be (8,128)-aligned when ``true_hw`` is given (pre-pad
    once outside the GN loop); otherwise it is padded here.
    ``active`` ([B] bool): lanes whose grid steps are skipped entirely
    (their moment rows stay zero) — converged/failed lanes in the GN
    loop's convergence tail.

    A 4th ``srcs`` plane is cv2 findTransformECC's preprocessed binary
    inputMask (ops/ecc.py ``_ecc_prepare_input_masked_jit``; gx/gy must
    already be pre-multiplied by it): the kernel nearest-taps it with
    each lane's warp and uses it in place of the all-ones validity
    mask, so masked solves keep kernel speed.
    """
    n_src, h_in, w_in = srcs.shape
    assert n_src in (3, 4), srcs.shape
    b, ht, wt = templates.shape
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
        hp = ((h + 7) // 8) * 8
        wp = ((w + 127) // 128) * 128
        if (hp, wp) != (h, w):
            srcs = jnp.pad(srcs, ((0, 0), (0, hp - h), (0, wp - w)))
    if (ht, wt) != (h, w):
        raise ValueError(f"templates {ht}x{wt} != source extent {h}x{w}")
    th, tw = tile
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(f"tile {tile}: need rows % 8 == 0, cols % 128 == 0")
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    if hp < wh or wp < ww:
        raise ValueError(f"image {h}x{w} too small for window {wh}x{ww}")
    n_params, n_out = moments_layout(motion_type, with_hessian)
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    mflat = m3.reshape(b, 9).astype(jnp.float32)
    act = (
        jnp.ones((b,), jnp.float32)
        if active is None
        else active.astype(jnp.float32)
    )
    params = jnp.concatenate(
        [mflat, act[:, None], jnp.zeros((b, 2), jnp.float32)], axis=1
    )
    kernel = functools.partial(
        _moments_kernel,
        th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
        motion_type=motion_type, quant_affine=quant_affine, n_out=n_out,
        with_hessian=with_hessian, n_src=n_src,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_out), jnp.float32),
        grid=(b, ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, th, tw), lambda bb, i, j: (bb, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, n_out), lambda bb, i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((n_src, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((n_src,)),
        ],
        # the unrolled tap loop + Jacobian Gram sums keep ~45 MB of tile
        # temporaries live; the Mosaic default scoped-vmem limit is a
        # conservative 16 MB but v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(params, srcs.astype(jnp.float32), templates.astype(jnp.float32))


def unpack_moments(
    mom: jnp.ndarray, motion_type: MotionType, with_hessian: bool = True
):
    """[B, n_out] moments -> (n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti,
    hessian [B,P,P] (or None), j_i [B,P], j_m [B,P], j_mt [B,P])."""
    p = motion_type.num_params
    n_raw = mom[:, 0]
    s_mi, s_mii, s_mt, s_mtt, s_mti = (mom[:, i] for i in range(1, 6))
    j_i = mom[:, 6 : 6 + p]
    j_m = mom[:, 6 + p : 6 + 2 * p]
    j_mt = mom[:, 6 + 2 * p : 6 + 3 * p]
    hess = None
    if with_hessian:
        o = 6 + 3 * p
        tri = mom[:, o : o + p * (p + 1) // 2]
        rows, cols = jnp.triu_indices(p)
        hess = jnp.zeros((mom.shape[0], p, p), mom.dtype)
        hess = hess.at[:, rows, cols].set(tri)
        hess = hess.at[:, cols, rows].set(tri)
    return n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti, hess, j_i, j_m, j_mt


# ---------------------------------------------------------------------------
# Inverse-compositional (IC) iteration kernel
#
# The forward kernel above re-derives the motion Jacobian from the WARPED
# input gradients every iteration — 3 window DMAs, a 3-source tap loop and
# 66 Gram reductions per homography sweep.  The IC formulation (Baker &
# Matthews' inverse-compositional trick applied to the ECC objective;
# beyond-OpenCV capability, the reference always runs forward-additive via
# cv2 — src/lib.rs:769-777) linearises the TEMPLATE side instead: the
# Jacobian lives on the fixed template grid at the identity warp, so its
# Gram (the Hessian) is computed ONCE and each subsequent sweep only needs
#
#   - 1 warped-input window DMA + a 1-source tap loop (vs 3 + 3),
#   - the template tile re-read with a 1-px halo (gradients in-register,
#     exact reflect101 semantics: border gradients are zero),
#   - 6 + 3P reductions (30 for homography) instead of 6 + P(P+3)/2 + ...
#
# The warp update composes: W <- W @ inv(w(dp)) (see ops/ecc.py
# _compose_warp_ic).  Moment layout (``ic_moments_layout``):
#   [ n, S(m*i), S(m*i^2), S(m*t), S(m*t^2), S(m*t*i),
#     S(m*jt_p*i) (P), S(m*jt_p) (P), S(m*jt_p*t) (P)
#     [, H_pq upper tri (P(P+1)/2) when with_hessian] ]
# ---------------------------------------------------------------------------

_IDENTITY_M = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def ic_moments_layout(
    motion_type: MotionType, with_hessian: bool
) -> Tuple[int, int]:
    """(n_params, n_out) for the IC moments vector."""
    p = motion_type.num_params
    n = 6 + 3 * p
    if with_hessian:
        n += p * (p + 1) // 2
    return p, n


def _ic_moments_kernel(
    m_ref,  # SMEM [B, 12]
    src_ref,  # ANY [Hp, Wp] (blurred input image)
    tmpl_ref,  # ANY [B, Hp, Wp] (blurred templates, pre-padded)
    out_ref,  # SMEM [B, n_out]
    scratch,  # VMEM [2, WH, WW] (image window, template window)
    sem,  # DMA semaphores [2]
    *,
    th: int,
    tw: int,
    k: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    motion_type: MotionType,
    quant_affine: bool,
    with_hessian: bool,
    n_out: int,
):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    y0 = ti * th
    x0 = tj * tw
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256

    first = (b == 0) & (ti == 0) & (tj == 0)

    @pl.when(first)
    def _():
        for bb in range(out_ref.shape[0]):
            for idx in range(n_out):
                out_ref[bb, idx] = jnp.float32(0.0)

    lane_active = m_ref[b, 9] != 0.0

    @pl.when(lane_active)
    def _lane():
        m = [m_ref[b, i] for i in range(9)]
        r0, c0, r0_ideal, c0_ideal = compute_window_origin(
            m, ti, tj, th=th, tw=tw, k=k, hp=hp, wp=wp
        )
        img_copy = pltpu.make_async_copy(
            src_ref.at[pl.ds(r0, wh), pl.ds(c0, ww)], scratch.at[0],
            sem.at[0],
        )
        img_copy.start()
        # template window at the IDENTITY origin: tile plus a (k+1)-px
        # halo normalised by the same clip-and-roll machinery (only the
        # 1-px gradient halo is consumed)
        r0i_t = y0 - (k + 1)
        c0i_t = x0 - (k + 1)
        r0t = (jnp.clip(r0i_t, 0, hp - wh) // 8) * 8
        c0t = (jnp.clip(c0i_t, 0, wp - ww) // 128) * 128
        tmpl_copy = pltpu.make_async_copy(
            tmpl_ref.at[b, pl.ds(r0t, wh), pl.ds(c0t, ww)], scratch.at[1],
            sem.at[1],
        )
        tmpl_copy.start()

        sx, sy, fx0, fy0, fx, fy = compute_source_coords(
            m, y0, x0, th=th, tw=tw, quant_affine=quant_affine
        )
        iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        ys = (y0 + iy).astype(jnp.float32)
        xs = (x0 + ix).astype(jnp.float32)
        valid = ((y0 + iy < h) & (x0 + ix < w)).astype(jnp.float32)
        xi = jnp.round(sx)
        yi = jnp.round(sy)
        mask = (
            (xi >= 0.0) & (xi <= w - 1.0) & (yi >= 0.0) & (yi <= h - 1.0)
        ).astype(jnp.float32) * valid

        sy_rel = fy0.astype(jnp.int32) - r0_ideal - iy
        sx_rel = fx0.astype(jnp.int32) - c0_ideal - ix
        vx0 = ((fx0 >= 0.0) & (fx0 <= w - 1.0)).astype(jnp.float32)
        vx1 = ((fx0 >= -1.0) & (fx0 <= w - 2.0)).astype(jnp.float32)
        vy0 = ((fy0 >= 0.0) & (fy0 <= h - 1.0)).astype(jnp.float32)
        vy1 = ((fy0 >= -1.0) & (fy0 <= h - 2.0)).astype(jnp.float32)
        n_taps = 2 * k + 3
        wx_list = [
            (1.0 - fx) * vx0 * (sx_rel == t) + fx * vx1 * (sx_rel == t - 1)
            for t in range(0, n_taps + 1)
        ]

        img_copy.wait()
        tmpl_copy.wait()
        win = scratch[0]
        win = pltpu.roll(win, jnp.mod(r0 - r0_ideal, wh), 0)
        win = pltpu.roll(win, jnp.mod(c0 - c0_ideal, ww), 1)
        twin = scratch[1]
        twin = pltpu.roll(twin, jnp.mod(r0t - r0i_t, wh), 0)
        twin = pltpu.roll(twin, jnp.mod(c0t - c0i_t, ww), 1)

        # 1-source bilinear warp of the input image
        imw = jnp.zeros((th, tw), jnp.float32)
        for ss in range(0, n_taps + 1):
            w_s = (
                (1.0 - fy) * vy0 * (sy_rel == ss)
                + fy * vy1 * (sy_rel == ss - 1)
            )
            t_i = jnp.zeros((th, tw), jnp.float32)
            for tt, wx in enumerate(wx_list):
                t_i = t_i + wx * win[ss : ss + th, tt : tt + tw]
            imw = imw + w_s * t_i

        # template tile + central-difference gradients from the halo'd
        # window; reflect101 central differences vanish at the image
        # border, so border masking IS the exact border rule
        k1 = k + 1
        tmpl = twin[k1 : k1 + th, k1 : k1 + tw]
        gtx = 0.5 * (
            twin[k1 : k1 + th, k1 + 1 : k1 + 1 + tw]
            - twin[k1 : k1 + th, k1 - 1 : k1 - 1 + tw]
        )
        gty = 0.5 * (
            twin[k1 + 1 : k1 + 1 + th, k1 : k1 + tw]
            - twin[k1 - 1 : k1 - 1 + th, k1 : k1 + tw]
        )
        bmx = ((xs >= 1.0) & (xs <= w - 2.0)).astype(jnp.float32)
        bmy = ((ys >= 1.0) & (ys <= h - 2.0)).astype(jnp.float32)
        gtx = gtx * bmx * valid
        gty = gty * bmy * valid
        tmpl = jnp.where(valid > 0, tmpl, 0.0)

        # template-side Jacobian at the identity warp: hatX/hatY are the
        # output coordinates themselves and the projective denominator
        # is 1
        jac = _jac_tile_fields(
            motion_type, gtx, gty, xs, ys, xs, ys, 1.0, _IDENTITY_M
        )
        p = len(jac)
        jm = [jj * mask for jj in jac]

        mi = mask * imw
        mt = mask * tmpl
        partials = [
            jnp.sum(mask),
            jnp.sum(mi),
            jnp.sum(mi * imw),
            jnp.sum(mt),
            jnp.sum(mt * tmpl),
            jnp.sum(mt * imw),
        ]
        for a in range(p):
            partials.append(jnp.sum(jm[a] * imw))
        for a in range(p):
            partials.append(jnp.sum(jm[a]))
        for a in range(p):
            partials.append(jnp.sum(jm[a] * tmpl))
        if with_hessian:
            # mask^2 == mask, so jm[a] * jac[b] == m * jt_a * jt_b
            for a in range(p):
                for bq in range(a, p):
                    partials.append(jnp.sum(jm[a] * jac[bq]))
        assert len(partials) == n_out

        for idx, val in enumerate(partials):
            out_ref[b, idx] += val


@functools.partial(
    jax.jit,
    static_argnames=(
        "motion_type", "k", "tile", "quant_affine", "interpret", "true_hw",
        "with_hessian",
    ),
)
def ecc_ic_iteration_moments(
    src: jnp.ndarray,  # [Hp, Wp] f32 blurred input image, pre-padded
    templates: jnp.ndarray,  # [B, Hp, Wp] f32 blurred templates, pre-padded
    m3: jnp.ndarray,  # [B, 3, 3] warp matrices (inverse-map convention)
    motion_type: MotionType,
    k: int = 7,
    tile: Tuple[int, int] = (128, 128),
    quant_affine: bool = False,
    interpret: bool = False,
    true_hw: Optional[Tuple[int, int]] = None,
    active: Optional[jnp.ndarray] = None,
    with_hessian: bool = False,
) -> jnp.ndarray:
    """One fused inverse-compositional ECC sweep -> [B, n_out] moments.

    Unlike :func:`ecc_iteration_moments`, ``templates`` must also be
    (8,128)-pre-padded when ``true_hw`` is given (the kernel DMAs
    haloed template windows manually instead of streaming exact tiles).
    ``with_hessian=True`` additionally accumulates the template-side
    Jacobian Gram (computed once per solve, then carried — see
    ops/ecc.py ``_ecc_loop_batched`` mode='ic').
    """
    h_in, w_in = src.shape
    b, ht, wt = templates.shape
    if true_hw is not None:
        h, w = true_hw
        if h_in % 8 != 0 or w_in % 128 != 0 or h_in < h or w_in < w:
            raise ValueError(
                f"pre-padded src {h_in}x{w_in} must be (8,128)-aligned "
                f"and cover true_hw {true_hw}"
            )
        if (ht, wt) != (h_in, w_in):
            raise ValueError(
                f"pre-padded templates {ht}x{wt} must match src "
                f"{h_in}x{w_in}"
            )
        hp, wp = h_in, w_in
    else:
        h, w = h_in, w_in
        if (ht, wt) != (h, w):
            raise ValueError(f"templates {ht}x{wt} != source extent {h}x{w}")
        hp = ((h + 7) // 8) * 8
        wp = ((w + 127) // 128) * 128
        if (hp, wp) != (h, w):
            src = jnp.pad(src, ((0, hp - h), (0, wp - w)))
            templates = jnp.pad(
                templates, ((0, 0), (0, hp - h), (0, wp - w))
            )
    th, tw = tile
    wh = ((th + 2 * k + 10 + 7) // 8) * 8
    ww = tw + 256
    if tw % 128 != 0 or th % 8 != 0:
        raise ValueError(f"tile {tile}: need rows % 8 == 0, cols % 128 == 0")
    if not (1 <= k <= 40):
        raise ValueError(f"k={k} outside the supported band (1..40)")
    if hp < wh or wp < ww:
        raise ValueError(f"image {h}x{w} too small for window {wh}x{ww}")
    n_params, n_out = ic_moments_layout(motion_type, with_hessian)
    ny, nx = pl.cdiv(h, th), pl.cdiv(w, tw)
    mflat = m3.reshape(b, 9).astype(jnp.float32)
    act = (
        jnp.ones((b,), jnp.float32)
        if active is None
        else active.astype(jnp.float32)
    )
    params = jnp.concatenate(
        [mflat, act[:, None], jnp.zeros((b, 2), jnp.float32)], axis=1
    )
    kernel = functools.partial(
        _ic_moments_kernel,
        th=th, tw=tw, k=k, h=h, w=w, hp=hp, wp=wp,
        motion_type=motion_type, quant_affine=quant_affine,
        with_hessian=with_hessian, n_out=n_out,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_out), jnp.float32),
        grid=(b, ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (b, n_out), lambda bb, i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(params, src.astype(jnp.float32), templates.astype(jnp.float32))


def unpack_ic_moments(
    mom: jnp.ndarray, motion_type: MotionType, with_hessian: bool
):
    """[B, n_out] IC moments -> (n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti,
    j_i [B,P], j_m [B,P], j_mt [B,P][, hessian [B,P,P]])."""
    p = motion_type.num_params
    n_raw = mom[:, 0]
    s_mi, s_mii, s_mt, s_mtt, s_mti = (mom[:, i] for i in range(1, 6))
    j_i = mom[:, 6 : 6 + p]
    j_m = mom[:, 6 + p : 6 + 2 * p]
    j_mt = mom[:, 6 + 2 * p : 6 + 3 * p]
    base = (n_raw, s_mi, s_mii, s_mt, s_mtt, s_mti, j_i, j_m, j_mt)
    if not with_hessian:
        return base
    o = 6 + 3 * p
    tri = mom[:, o : o + p * (p + 1) // 2]
    rows, cols = jnp.triu_indices(p)
    hess = jnp.zeros((mom.shape[0], p, p), mom.dtype)
    hess = hess.at[:, rows, cols].set(tri)
    hess = hess.at[:, cols, rows].set(tri)
    return base + (hess,)
