"""Device-mesh scale-out for burst stacking.

The reference's only parallelism is Rayon shared-memory data-parallelism
over frames with a commutative sum-reduction (SURVEY.md §2c;
src/lib.rs:188-335).  The TPU-native replacement is SPMD over a
``jax.sharding.Mesh``:

- **data axis** — the frame axis of the ``[N,H,W,C]`` burst tensor is
  sharded across chips; each chip aligns and warps its local frames and
  the running-sum fold becomes a ``psum`` over ICI.
- **spatial axis** — for very large frames, rows are sharded across a
  second mesh axis; conv-window overlap is satisfied by halo exchange
  (``ppermute``), the 2-D analogue of sequence/context parallelism
  (SURVEY.md §5 "long-context analogue").

Everything here uses ``shard_map`` so collectives are explicit and ride
ICI; no NCCL-style process groups exist (nothing to port: the reference
has no distributed backend, SURVEY.md §2c).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import MotionType
from ..ops import color, ecc as ecc_ops, filters, warp

# shard_map moved to jax.shard_map in newer JAX; fall back if needed.
try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.5-ish

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    spatial: int = 1,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f"data({data}) * spatial({spatial}) != devices({n})")
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_frames(frames: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a [N,H,W,C] burst with the frame axis sharded over 'data'."""
    return jax.device_put(frames, NamedSharding(mesh, P("data")))


# --- multi-host (DCN) scale-out -------------------------------------------
#
# The reference has no distributed story at all (SURVEY.md §2c); this is
# the SURVEY §7 phase-6 extension: standard `jax.distributed` process
# initialisation, one global mesh whose 'data' axis spans hosts (frame
# shards ride DCN only for the final psum; all per-frame work is local),
# and a helper to assemble the global burst from per-process frames.


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join (or bootstrap) a multi-host run: thin wrapper over
    ``jax.distributed.initialize``.  On TPU pods the arguments are
    auto-detected from the environment; on CPU/GPU pass coordinator
    address, world size and rank explicitly."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_global_mesh(data: Optional[int] = None, spatial: int = 1) -> Mesh:
    """('data', 'spatial') mesh over ALL devices of a multi-process run
    (``jax.devices()`` is global after ``init_distributed``).  Device
    order keeps each process's local devices contiguous on the 'data'
    axis, so the frame shards a process feeds stay on its own chips and
    only the stacking psum crosses DCN."""
    return make_mesh(jax.devices(), data=data, spatial=spatial)


def shard_frames_global(frames_local: np.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Assemble the global [N_total,H,W,C] burst from each process's
    local frames (every process passes its own shard; N_total =
    num_processes * n_local).  The result is one global jax.Array with
    the frame axis sharded over 'data' — feed it to
    :func:`ecc_stack_step` unchanged."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, frames_local)


def ecc_stack_step(
    frames_u8: jnp.ndarray,
    reference_grey: jnp.ndarray,
    mesh: Mesh,
    motion_type: MotionType = MotionType.Homography,
    num_iters: int = 50,
    eps: float = 1e-4,
    gauss_filt_size: int = 5,
    phase_init: bool = True,
    stacking: str = "mean",
    sigma_kappa: float = 2.5,
    sigma_iters: int = 1,
    scale_hw=None,
    coarse_levels: int = 0,
    input_mask: Optional[jnp.ndarray] = None,
    lane_valid: Optional[jnp.ndarray] = None,
    return_extras: bool = False,
    output_scale: int = 1,
    mode: Optional[str] = None,
):
    """One full sharded align+stack step.

    ``frames_u8``: [N,H,W,3] uint8, N divisible by the 'data' axis size.
    ``reference_grey``: [H,W] float32 (frame 0's grey, replicated).

    r5 structure (VERDICT r4 item 8): the step is a HOST-DRIVEN
    composition of three bounded shard_map programs instead of one
    monolithic device program —

    1. *prep* (:func:`_ecc_prep_program`): per-shard grey conversion,
       optional scale-down, octave pyramid build, template blur and the
       phase-correlation warm start;
    2. *solve* (:func:`_ecc_solve_sharded`): the slab-driven batched
       Gauss-Newton solve, mirroring the dense host driver
       (``ops.ecc.find_transform_ecc_batched``) level for level — the
       same coarse-to-fine rho seeding, the same k-escalation ladder on
       TPU, the same exact-XLA rescue of failed lanes, and the same
       ``default_slab_iters`` program-length bound, so no single device
       program can trip the TPU runtime's long-program watchdog even at
       ``max_count=2500`` (the monolithic in-graph solve ran the whole
       iteration budget as one program);
    3. *stack* (:func:`_ecc_stack_program`): per-shard warp+accumulate
       with the SAME host-side Pallas band dispatch the single-chip
       pipelines use (``pallas_pick_config`` over the solved, fetched
       warps), then ``psum`` over 'data' replaces the reference's
       try_reduce (src/lib.rs:819-833).

    Returns (stacked_sum [H,W,3] f32 replicated, ok [N] bool numpy).

    ``stacking="sigma_clip"`` (beyond-reference, see ops/stack.py):
    kappa-sigma outlier rejection distributes naturally over the mesh —
    each device warps only its local frames and the per-pixel moment
    accumulators (count / sum / sum-of-squares, then the clipped
    versions) ``psum`` over 'data'; per-device memory stays at the
    local shard's warped frames.  The first return value is then the
    FINAL image (per-pixel denominators — do NOT divide again).
    Parity with the unsharded clip is near-exact, not bit-exact: the
    psum's reduction order perturbs mu/sigma at the last ulp, which can
    flip the inclusion of samples sitting exactly on the kappa
    boundary (each flip moves that pixel by at most one sample's
    influence; the mean path has no such discontinuity).

    ``output_scale`` > 1 (super-resolution, r4 VERDICT item 6): the
    shift-and-add deposit of ops/stack.py distributes like the moments —
    each shard deposits its local frames onto the fine grid and the
    weight/value accumulators ``psum`` over 'data'.  The first return
    value is then the FINAL [f*H, f*W, 3] image.  Not combinable with
    ``stacking="sigma_clip"``.

    Feature parity with the single-chip pipeline (r3 VERDICT item 2):

    - ``scale_hw``: the (h_small, w_small) SOLVE grid — the scale-down
      path of src/lib.rs:849-1028.  ``reference_grey`` must then be
      frame 0's grey AT that grid (``models.ecc._ecc_grey_jit`` with
      the same ``scale_hw``); each shard resizes its local greys
      in-graph (uint8-rounded INTER_AREA, dense-path parity) and the
      solved warps are upscaled (src/lib.rs:941-958) before the
      full-res warp.
    - ``coarse_levels``: coarse-to-fine octave cascade with the dense
      driver's cross-scale rho seeding (r4 VERDICT item 7 — the two
      drivers now share one stopping rule, so mesh on/off parity is
      tight).
    - ``input_mask``: cv2 ``inputMask`` at the SOLVE grid, replicated
      (prepare with ``models.ecc._ecc_mask_jit``); disables the phase
      warm start like the single-chip pipeline.
    - ``lane_valid`` ([N] bool): padding mask — lanes marked False
      (frames appended to make N divide the data axis) are excluded
      from the sum and reported ok=False.
    - ``return_extras``: also return (rho [N], num_iters [N]) for
      PipelineStats parity.

    uint16 bursts work unchanged: alignment runs on the high-byte
    reduction, stacking at native depth (color.depth_reduce_u8 /
    to_unit_f32 — same contract as the single-chip pipelines).

    Every program is built once per (mesh, config) and wrapped in
    ``jax.jit`` — calling ``shard_map`` eagerly re-dispatches outside
    the jit cache and, on the TPU backend, recompiles the whole module
    on EVERY call (measured: 306 s per call at 4x240x320 vs 15 s once
    under jit; the persistent compilation cache only hooks the jit
    path).
    """
    if stacking not in ("mean", "sigma_clip"):
        raise ValueError(
            f"stacking must be 'mean' or 'sigma_clip', got {stacking!r}"
        )
    if output_scale > 1 and stacking != "mean":
        raise ValueError(
            "output_scale > 1 cannot be combined with sigma_clip"
        )
    if input_mask is not None:
        phase_init = False  # whole-frame FFT would see the masked content
    n, h, w = frames_u8.shape[0], frames_u8.shape[1], frames_u8.shape[2]
    ndata = mesh.shape["data"]
    if n % ndata != 0:
        raise ValueError(f"N={n} must divide the data axis ({ndata})")

    if scale_hw is not None:
        scale_hw = (int(scale_hw[0]), int(scale_hw[1]))
        if tuple(reference_grey.shape) != scale_hw:
            raise ValueError(
                f"reference_grey must be at the solve grid {scale_hw}, "
                f"got {tuple(reference_grey.shape)}"
            )
    warps, rho, iters, ok_np = _ecc_solve_sharded(
        frames_u8, reference_grey, mesh,
        motion_type=motion_type, num_iters=int(num_iters), eps=float(eps),
        gauss_filt_size=int(gauss_filt_size), phase_init=bool(phase_init),
        scale_hw=scale_hw, coarse_levels=int(coarse_levels),
        input_mask=input_mask, mode=mode,
    )
    if lane_valid is not None:
        ok_np = ok_np & np.asarray(jax.device_get(lane_valid), bool)
    total = _ecc_stack_sharded(
        frames_u8, warps, ok_np, mesh,
        motion_type=motion_type, scale_hw=scale_hw, stacking=stacking,
        sigma_kappa=float(sigma_kappa), sigma_iters=int(sigma_iters),
        output_scale=int(output_scale),
    )
    if return_extras:
        return total, ok_np, rho, iters
    return total, ok_np


def _ecc_solve_sharded(
    frames_u8,
    reference_grey,
    mesh: Mesh,
    motion_type: MotionType,
    num_iters: int,
    eps: float,
    gauss_filt_size: int,
    phase_init: bool,
    scale_hw,
    coarse_levels: int,
    input_mask,
    mode: Optional[str] = None,
):
    """Slab-driven sharded ECC solve -> (warps [N,r,3] np.f64, rho [N],
    iters [N], ok [N] bool — all host numpy; warps are at the SOLVE
    grid).  Mirrors the dense host driver
    (``ops.ecc.find_transform_ecc_batched``) stage for stage so mesh
    on/off produces the same iterates: octave cascade with cross-scale
    rho seeding, k-escalation ladder on the fused TPU kernel, exact-XLA
    rescue for failed lanes, and ``default_slab_iters``-bounded device
    programs (r4 VERDICT items 7+8).  All host decisions are made from
    fully-replicated scalars/arrays, so every process of a multi-host
    (DCN) run takes identical control-flow branches.
    """
    import os as _os

    if mode is None:
        mode = ecc_ops._ecc_mode_default()
    if input_mask is not None and mode == "ic":
        mode = "forward"  # same downgrade as the dense driver
    n = frames_u8.shape[0]
    grid = (
        scale_hw if scale_hw is not None
        else (int(frames_u8.shape[1]), int(frames_u8.shape[2]))
    )
    hs, ws = grid
    levels = [
        lvl for lvl in range(1, coarse_levels + 1)
        if min(hs, ws) // 2 ** lvl >= 64
    ]
    level_shapes = tuple((hs // 2 ** lvl, ws // 2 ** lvl) for lvl in levels)

    # --- prep: per-shard grey + octave templates + phase warm start ---
    prep = _ecc_prep_program(
        mesh, scale_hw, level_shapes, int(gauss_filt_size),
        bool(phase_init), motion_type,
    )
    outs = prep(frames_u8, reference_grey)
    tmpl_by_level = {0: outs[0]}
    for i, lvl in enumerate(levels):
        tmpl_by_level[lvl] = outs[1 + i]
    warp_init = outs[-1] if phase_init else None

    # --- image-side fields per level (replicated; host-computed from
    # the replicated reference, exactly like the dense driver) ---
    ref_by_level = {0: reference_grey}
    mask_by_level = {0: input_mask}
    il = reference_grey
    ml = (
        None if input_mask is None
        else (jnp.asarray(input_mask) > 0).astype(jnp.float32)
    )
    for lvl in range(1, (max(levels) + 1) if levels else 1):
        dh, dw = hs // 2 ** lvl, ws // 2 ** lvl
        il = ecc_ops._resize_area_jit(il, dh, dw)
        if ml is not None:
            ml = ecc_ops._resize_area_jit(ml, dh, dw)
        if lvl in levels:
            ref_by_level[lvl] = il
            mask_by_level[lvl] = None if ml is None else ml >= 0.5

    eps_oct = eps
    if eps > 0:
        eps_oct = eps * float(
            _os.environ.get("LIBSTACKER_COARSE_EPS_MULT", "1")
        )

    init = warp_init
    rho_seed = None
    for lvl in sorted(levels, reverse=True):
        s = 2 ** lvl
        if init is not None and init is warp_init and lvl == max(levels):
            # the phase warm start is at the solve grid; bring it to the
            # deepest octave (subsequent levels rescale 2x below)
            init = _rescale_warps_jit(init, motion_type, 1.0 / s)
        wm, rho_o, ok_o = _drive_sharded_solve(
            mesh, tmpl_by_level[lvl], ref_by_level[lvl],
            mask_by_level[lvl], init, None, motion_type, num_iters,
            eps_oct, gauss_filt_size, mode, n,
        )[:3]
        # a failed/frozen octave lane's iterate is not a meaningful warm
        # start — hand the finer level this level's own init (dense
        # driver semantics via the rescue; here via explicit fallback)
        base = init
        if base is None:
            base = np.tile(
                np.asarray(ecc_ops.identity_warp(motion_type)),
                (n, 1, 1),
            )
        wm = _where_ok_jit(ok_o, wm, base)
        init = _rescale_warps_jit(wm, motion_type, 2.0)
        # cross-scale rho seed (r4 VERDICT item 7): the SAME stopping
        # rule as the dense driver — a lane whose octave converged hands
        # its rho down so the finer level stops after one polishing
        # iteration when |d rho| < eps across the scale change
        rho_seed = _rho_seed_jit(ok_o, rho_o)
    if _os.environ.get("LIBSTACKER_COARSE_RHO_SEED", "1") == "0":
        rho_seed = None
    wm, rho, ok, iters = _drive_sharded_solve(
        mesh, tmpl_by_level[0], ref_by_level[0], mask_by_level[0],
        init, rho_seed, motion_type, num_iters, eps, gauss_filt_size,
        mode, n,
    )
    return (
        np.asarray(jax.device_get(wm), np.float64),
        np.asarray(jax.device_get(rho)),
        np.asarray(jax.device_get(iters)),
        np.asarray(jax.device_get(ok), bool),
    )


def _drive_sharded_solve(
    mesh: Mesh,
    templates_f,  # [N,h,w] f32 blurred, sharded P('data')
    ref_grey,  # [h,w] f32 (RAW, unblurred), replicated
    input_mask,  # [h,w] bool/float or None, replicated
    warp_init,  # [N,r,3] or None
    rho_seed,  # [N] f32 or None (octave rho, -1 = no seed)
    motion_type: MotionType,
    num_iters: int,
    eps: float,
    gauss_filt_size: int,
    mode: str,
    n: int,
):
    """Drive one grid level's sharded solve to completion: bounded slab
    programs with host-synced convergence flags, the k-escalation
    ladder on TPU and the exact-XLA rescue — the sharded mirror of the
    dense driver's ``drive`` loop.  Returns (m, rho, ok, iters) as
    REPLICATED device arrays."""
    import os as _os

    h, w = int(templates_f.shape[1]), int(templates_f.shape[2])
    ndata = mesh.shape["data"]
    n_loc = n // ndata
    pre_mask = None
    if input_mask is not None:
        image_f, gx, gy, pre_mask = ecc_ops._ecc_prepare_input_masked_jit(
            ref_grey, input_mask, gauss_filt_size
        )
    else:
        image_f, gx, gy = ecc_ops._ecc_prepare_input_jit(
            ref_grey, gauss_filt_size
        )

    carry = _sharded_carry_init(
        n, motion_type, mode, eps, warp_init, rho_seed
    )
    m_init = carry[0]

    use_pallas = (
        ecc_ops._pallas_ok(h, w)
        and tuple(image_f.shape[-2:]) == (h, w)
    )

    def drive(carry, use_pallas: bool, warp_k: int = 7):
        slab_iters = ecc_ops.default_slab_iters(
            n_loc, h, w, use_pallas=use_pallas
        )
        fn = _ecc_slab_program(
            mesh, motion_type, num_iters, float(eps), slab_iters,
            use_pallas, warp_k, mode, pre_mask is not None,
        )
        disp = 1
        while True:
            for _ in range(disp):
                args = (templates_f, image_f, gx, gy) + tuple(carry)
                if pre_mask is not None:
                    args = args + (pre_mask,)
                out = fn(*args)
                carry = out[:-2]
                flags = out[-2:]
            not_done, esc_pending = jax.device_get(
                (flags[0], flags[1])
            )
            if int(not_done) == 0:
                return carry, int(esc_pending) > 0
            disp = min(disp * 2, 8)

    if not use_pallas:
        carry, _ = drive(carry, False)
    else:
        env_k = ecc_ops._ecc_warp_k()
        ladder = (env_k,) if env_k is not None else ecc_ops._K_LADDER
        for ki, k in enumerate(ladder):
            carry, esc_pending = drive(carry, True, k)
            if ki + 1 == len(ladder) or not esc_pending:
                break
            carry = _reactivate_sharded_jit(carry, float(eps))
        # exact-XLA rescue of any failed lane (genuine ECC failures get
        # the reference formulation's verdict; domain-escapes beyond
        # the widest band get the unbounded gather path)
        any_bad = int(jax.device_get(_count_bad_jit(carry[4])))
        if any_bad:
            if mode in ("ic", "lazy"):
                carry = (_restore_init_jit(carry[4], carry[0], m_init),
                         ) + tuple(carry[1:])
            carry = _reactivate_sharded_jit(
                carry, float(eps), all_bad=True
            )
            carry, _ = drive(carry, False)

    gather = _ecc_gather_program(mesh, 4)
    m, rho, ok, iters = gather(carry[0], carry[1], carry[4], carry[3])
    return m, rho, ok, iters


@functools.lru_cache(maxsize=64)
def _ecc_prep_program(
    mesh: Mesh,
    scale_hw,
    level_shapes,
    gauss_filt_size: int,
    phase_init: bool,
    motion_type: MotionType,
):
    """Per-shard solve prep: grey conversion (+ optional INTER_AREA
    scale-down, dense-path parity: resize the uint8 grey BEFORE the
    float cast), blurred templates for the solve grid and every octave
    (cascaded 2x INTER_AREA reductions of the RAW grey, like the dense
    octave build), and the phase-correlation warm start.  All
    per-frame-local — no collectives."""
    from ..ops import resize as resize_ops
    from .. import constants

    def local(frames_local, ref_grey):
        grey_u8 = color.rgb_to_gray_u8(color.depth_reduce_u8(frames_local))
        if scale_hw is not None:
            grey_u8 = resize_ops.resize(
                grey_u8, scale_hw, constants.INTER_AREA
            )
        grey = grey_u8.astype(jnp.float32)
        outs = [filters.gaussian_blur(grey, gauss_filt_size)]
        tl = grey
        for dh, dw in level_shapes:
            tl = ecc_ops._resize_area_jit(tl, dh, dw)
            outs.append(filters.gaussian_blur(tl, gauss_filt_size))
        if phase_init:
            from ..ops import phasecorr

            outs.append(
                phasecorr.phase_init_warps(
                    grey, ref_grey, motion_type=motion_type
                )
            )
        return tuple(outs)

    nout = 1 + len(level_shapes) + (1 if phase_init else 0)
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=tuple([P("data")] * nout),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=128)
def _ecc_slab_program(
    mesh: Mesh,
    motion_type: MotionType,
    num_iters: int,
    eps: float,
    slab_iters: int,
    use_pallas: bool,
    warp_k: int,
    mode: str,
    has_mask: bool,
):
    """One bounded solve slab as a shard_map program: each shard
    advances its local lanes by at most ``slab_iters`` Gauss-Newton
    iterations (``ops.ecc._ecc_loop_batched`` — the exact same slab the
    dense driver dispatches), then psums two replicated scalars the
    host drive loop reads: the not-yet-converged lane count and the
    domain-escalation-pending count."""
    from ..ops.ecc import _MAX_SOLVE_LANES

    def local(tmpl_f, image_f, gx, gy, *rest):
        if has_mask:
            carry, pre_mask = rest[:-1], rest[-1]
        else:
            carry, pre_mask = rest, None
        n_loc = tmpl_f.shape[0]
        # static lane-group chunking: the fused kernel's SMEM moment
        # accumulator bounds one batched solve at _MAX_SOLVE_LANES
        new_parts = []
        for s0 in range(0, n_loc, _MAX_SOLVE_LANES):
            sub = tuple(c[s0 : s0 + _MAX_SOLVE_LANES] for c in carry)
            new_parts.append(ecc_ops._ecc_loop_batched(
                tmpl_f[s0 : s0 + _MAX_SOLVE_LANES], image_f, gx, gy,
                sub, motion_type, num_iters, eps, slab_iters,
                use_pallas, warp_k, mode, pre_mask,
            ))
        new_c = tuple(
            jnp.concatenate([p[i] for p in new_parts])
            for i in range(len(new_parts[0]))
        )
        m, rho, last_rho, it, ok = new_c[:5]
        done = (it >= num_iters) | (jnp.abs(rho - last_rho) < eps) | ~ok
        not_done = jax.lax.psum(jnp.sum(~done), "data")
        esc_pending = jax.lax.psum(
            jnp.sum(new_c[5] & ~new_c[4]), "data"
        )
        return new_c + (not_done, esc_pending)

    n_carry = 8 if mode in ("ic", "lazy") else 6
    in_specs = (P("data"), P(), P(), P()) + tuple([P("data")] * n_carry)
    if has_mask:
        in_specs = in_specs + (P(),)
    out_specs = tuple([P("data")] * n_carry) + (P(), P())
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    ))


def _sharded_carry_init(n, motion_type, mode, eps, warp_init, rho_seed):
    """Fresh solve carry, mirroring the dense driver's init including
    the cross-scale rho seed semantics: seeded lanes start at
    (rho_seed, rho_seed - 2*eps) so the first iteration always runs
    and OpenCV's |d rho| < eps test applies across the scale change;
    unseeded lanes keep the (-1, -eps) cold start.  Host numpy for the
    constant leaves (auto-replicated at dispatch; safe multi-process),
    device arrays pass through."""
    if warp_init is None:
        m = np.tile(
            np.asarray(ecc_ops.identity_warp(motion_type)), (n, 1, 1)
        )
    else:
        m = warp_init
    if rho_seed is not None and eps > 0 and mode in ("forward", "lazy"):
        rho, last_rho = _seed_rho_jit(rho_seed, float(eps))
    else:
        rho = np.full((n,), -1.0, np.float32)
        last_rho = np.full((n,), -float(eps), np.float32)
    carry = (
        m,
        rho,
        last_rho,
        np.zeros((n,), np.int32),
        np.ones((n,), bool),
        np.zeros((n,), bool),
    )
    if mode in ("ic", "lazy"):
        p = motion_type.num_params
        carry = carry + (
            np.zeros((n, p, p), np.float32),
            np.zeros((n,), bool),
        )
    return carry


@functools.partial(jax.jit, static_argnames=("eps",))
def _seed_rho_jit(rho_seed, eps: float):
    valid = rho_seed > -1.0
    rho = jnp.where(valid, rho_seed, jnp.float32(-1.0))
    last = jnp.where(
        valid, rho_seed - jnp.float32(eps), jnp.float32(0.0)
    ) - jnp.float32(eps)
    return rho, last


@jax.jit
def _rho_seed_jit(ok, rho):
    return jnp.where(ok & (rho > -1.0), rho, jnp.float32(-1.0))


@functools.partial(jax.jit, static_argnames=("motion_type", "s"))
def _rescale_warps_jit(warps, motion_type: MotionType, s: float):
    return ecc_ops._rescale_warp_batch(
        jnp.asarray(warps, jnp.float32), motion_type, s
    )


@jax.jit
def _where_ok_jit(ok, a, b):
    return jnp.where(
        ok[:, None, None], jnp.asarray(a, jnp.float32),
        jnp.asarray(b, jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("eps", "all_bad"))
def _reactivate_sharded_jit(carry, eps: float, all_bad: bool = False):
    """Warm-start lanes for another drive pass: the escalated lanes
    (esc & ~ok) by default, or EVERY failed lane for the rescue pass —
    elementwise on the sharded carry (ops.ecc._reactivate_carry)."""
    lane_mask = (carry[5] & ~carry[4]) if not all_bad else ~carry[4]
    return ecc_ops._reactivate_carry(tuple(carry), eps, lane_mask)


@jax.jit
def _count_bad_jit(ok):
    return jnp.sum(~ok)


@jax.jit
def _restore_init_jit(ok, m, m_init):
    bad = ~ok
    return jnp.where(bad[:, None, None], jnp.asarray(m_init, m.dtype), m)


@functools.lru_cache(maxsize=64)
def _ecc_gather_program(mesh: Mesh, nout: int):
    """all_gather ``nout`` lane-sharded arrays to replicated (tiny —
    warps/rho/ok/iters), so the host (every process of a DCN run) can
    fetch them for the stage-3 dispatch decisions."""
    def local(*xs):
        return tuple(
            jax.lax.all_gather(x, "data", tiled=True) for x in xs
        )

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=tuple([P("data")] * nout),
        out_specs=tuple([P()] * nout),
        check_vma=False,
    ))


def _ecc_stack_sharded(
    frames_u8,
    warps_np: np.ndarray,  # [N,r,3] float64, at the SOLVE grid
    ok_np: np.ndarray,  # [N] bool
    mesh: Mesh,
    motion_type: MotionType,
    scale_hw,
    stacking: str,
    sigma_kappa: float,
    sigma_iters: int,
    output_scale: int = 1,
):
    """Stage 3 of the sharded step: adjust the solved warps for scale on
    host (src/lib.rs:941-958), sanitise failed lanes to identity, pick
    the Pallas kernel band with the SAME host dispatch the single-chip
    pipelines use, and run the per-shard warp+accumulate / sigma-clip /
    super-resolution program with a psum over 'data'."""
    from ..ops import warp_batch

    h, w = int(frames_u8.shape[1]), int(frames_u8.shape[2])
    perspective = motion_type == MotionType.Homography
    m = np.array(warps_np, np.float64, copy=True)
    if m.shape[-2] == 2:
        m3 = np.concatenate(
            [m, np.tile(np.asarray([[[0.0, 0.0, 1.0]]]), (m.shape[0], 1, 1))],
            axis=1,
        )
    else:
        m3 = m
    if scale_hw is not None:
        sx = w / scale_hw[1]
        sy = h / scale_hw[0]
        m3[:, 0, 2] *= sx
        m3[:, 1, 2] *= sy
        if perspective:
            m3[:, 2, 0] /= sx
            m3[:, 2, 1] /= sy
    m3[~ok_np] = np.eye(3)  # NaN matrices must not reach linalg.inv
    m3f = m3.astype(np.float32)
    kept = m3[ok_np] if ok_np.any() else m3[:0]
    if output_scale > 1:
        from ..ops.stack import _sr_pick_config

        cfg = _sr_pick_config(m3f, h, w, output_scale)
        fn = _ecc_sr_stack_program(
            mesh, int(output_scale), bool(perspective),
            cfg if cfg is None else (int(cfg[0]), int(cfg[1])),
        )
        return fn(frames_u8, m3f, ok_np)
    cfg = warp_batch.pallas_pick_config(kept, h, w)
    allow = cfg is not None
    k = cfg[0] if cfg else 7
    tile_rows = cfg[1] if cfg else 128
    if stacking == "sigma_clip":
        fn = _ecc_sigma_stack_program(
            mesh, bool(perspective), float(sigma_kappa),
            int(sigma_iters), allow, k, tile_rows,
        )
    else:
        fn = _ecc_mean_stack_program(
            mesh, bool(perspective), allow, k, tile_rows
        )
    return fn(frames_u8, m3f, ok_np)


@functools.lru_cache(maxsize=64)
def _ecc_mean_stack_program(
    mesh: Mesh, perspective: bool, allow_pallas: bool, pallas_k: int,
    tile_rows: int,
):
    """Per-shard fused warp+accumulate (RAW integer burst in, the
    kernel widens in-VMEM) + psum over 'data' — the reference's
    try_reduce (src/lib.rs:819-833)."""
    from ..ops.warp_batch import warp_accumulate_rgb

    def local(frames_local, m3_local, oks_local):
        partial = warp_accumulate_rgb(
            frames_local, m3_local, oks_local, perspective=perspective,
            allow_pallas=allow_pallas, pallas_k=pallas_k,
            pallas_tile_rows=tile_rows,
        )
        return jax.lax.psum(partial, "data")

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _ecc_sigma_stack_program(
    mesh: Mesh, perspective: bool, kappa: float, iters: int,
    allow_pallas: bool, pallas_k: int, tile_rows: int,
):
    """Per-shard warp + distributed kappa-sigma clip (psum'd per-pixel
    moments; ops/stack.clip_iterate is the single source of truth)."""
    from ..ops import stack as stack_ops
    from ..ops.warp_batch import warp_frames_batch

    def local(frames_local, m3_local, oks_local):
        h, w = frames_local.shape[1], frames_local.shape[2]
        f32 = color.to_unit_f32(frames_local)
        wf = warp_frames_batch(
            f32, m3_local, perspective=perspective,
            allow_pallas=allow_pallas, pallas_k=pallas_k,
            pallas_tile_rows=tile_rows,
        )
        incl = (
            stack_ops._coverage(m3_local, h, w, perspective)
            & oks_local[:, None, None]
        )
        return _sharded_sigma_total(wf, incl, kappa, iters)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=32)
def _ecc_sr_stack_program(
    mesh: Mesh, factor: int, perspective: bool, cfg,
):
    """Per-shard super-resolution deposit + psum'd fine-grid weight /
    value accumulators (r4 VERDICT item 6): each shard deposits its
    local frames (static lane chunks bound the [C,fH,fW,3] transients),
    the accumulators psum over 'data', and the finalisation
    (weight-normalised shift-and-add; ops/stack.py semantics) runs on
    the replicated sums.  ``cfg`` = (pallas_k, tile_rows) for the fused
    per-phase kernel path, or None for the XLA gather deposit."""
    from ..ops import stack as stack_ops

    kernel_sigma = 0.3  # super_res_stack's default (no hole fallback)

    def local(frames_local, m3_local, oks_local):
        n_loc = frames_local.shape[0]
        chunk = 4 if cfg is not None else 2
        acc = None
        for s0 in range(0, n_loc, chunk):
            sl = slice(s0, s0 + chunk)
            if cfg is not None:
                part = stack_ops._sr_kernel_chunk(
                    frames_local[sl], m3_local[sl], oks_local[sl],
                    factor=factor, kernel_sigma=kernel_sigma,
                    perspective=perspective, pallas_k=cfg[0],
                    pallas_tile_rows=cfg[1],
                )
            else:
                part = stack_ops._sr_chunk(
                    frames_local[sl], m3_local[sl], oks_local[sl],
                    factor=factor, kernel_sigma=kernel_sigma,
                    perspective=perspective, with_fallback=False,
                )
            acc = part if acc is None else tuple(
                a + p for a, p in zip(acc, part)
            )
        av = jax.lax.psum(acc[0], "data")
        aw = jax.lax.psum(acc[1], "data")
        if cfg is not None:
            out_p = av / jnp.maximum(aw, 1e-6)[..., None]
            return stack_ops._sr_interleave_phases(out_p, factor)
        return av / jnp.maximum(aw, 1e-6)[..., None]

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    ))


def _sharded_sigma_total(wf, incl, kappa: float, iters: int):
    """Distributed kappa-sigma clip over locally warped frames: the
    per-pixel moment accumulators ``psum`` over 'data' and the shared
    clip iteration (ops/stack.clip_iterate — the single source of truth
    for the clip semantics) runs on the replicated moments.  ``wf``:
    [n_loc,H,W,3] warped local frames; ``incl``: [n_loc,H,W] bool
    coverage-and-ok mask.  Returns the FINAL image (replicated)."""
    from ..ops import stack as stack_ops

    def moments(mask_f, per_channel):
        mf = mask_f if per_channel else mask_f[..., None]
        c0 = jax.lax.psum(jnp.sum(mask_f, axis=0), "data")
        c1 = jax.lax.psum(jnp.sum(mf * wf, axis=0), "data")
        c2 = jax.lax.psum(jnp.sum(mf * wf * wf, axis=0), "data")
        return c0, c1, c2

    s0, s1, s2 = moments(incl.astype(jnp.float32), per_channel=False)

    def clipped_moments(mu, tol):
        m = incl[..., None] & (jnp.abs(wf - mu) <= tol)
        return moments(m.astype(jnp.float32), per_channel=True)

    total, _kept = stack_ops.clip_iterate(
        s0, s1, s2, kappa, iters, clipped_moments
    )
    return total


def keypoint_stack_step(
    frames_u8: jnp.ndarray,
    ref_feats,
    mesh: Mesh,
    method: int = 8,
    ransac_reproj_threshold: float = 5.0,
    match_ratio: float = 0.9,
    match_keep_ratio: float = 0.8,
    max_iters: int = 2000,
    confidence: float = 0.995,
    seed: int = 0,
    stacking: str = "mean",
    sigma_kappa: float = 2.5,
    sigma_iters: int = 1,
    scale_hw=None,
    det_mask: Optional[jnp.ndarray] = None,
    border_mode: int = 0,
    border_value=(0.0, 0.0, 0.0, 0.0),
    lane_valid: Optional[jnp.ndarray] = None,
    return_extras: bool = False,
    output_scale: int = 1,
):
    """One full sharded ORB/RANSAC align+stack step — the keypoint-path
    counterpart of :func:`ecc_stack_step` (reference Rayon fan-out at
    src/lib.rs:188-335 for the ORB pipeline).

    ``frames_u8``: [N,H,W,3] uint8, N divisible by the 'data' axis size
    (frame 0 included — it matches the reference features at identity).
    ``ref_feats``: frame 0's ``OrbFeatures`` (replicated; compute once
    with ``models.keypoint.detect_features_chunked(frames[:1])`` and
    strip the leading axis).

    Per shard: batched ORB on local frames, Hamming 2-NN against the
    replicated reference descriptors, ratio/sort/keep, vectorised
    RANSAC (per-frame fold_in keys keep lanes independent of the mesh
    layout), then the stage-3 warp.  RANSAC homographies are unbounded,
    so the Pallas warp is gated by an IN-GRAPH residual-band check: the
    shard takes the fused-kernel path only when every kept lane sits in
    the kernel's widest band, else the exact XLA path — identical drop
    semantics to the single-chip pipeline either way.  ``psum`` over
    'data' replaces the Rayon fold.

    Returns (stacked_sum [H,W,3] f32 replicated, ok [N] bool); divide
    by ``ok.sum()`` for the mean like keypoint_match_arrays does.
    ``stacking="sigma_clip"`` mirrors :func:`ecc_stack_step`'s robust
    mode (the first return is then the FINAL image — don't divide).
    ``output_scale`` > 1 (super-resolution, r4 VERDICT item 6)
    distributes the shift-and-add deposit: each shard deposits its
    local frames on the fine grid (the XLA gather formulation of
    ops/stack._sr_chunk — RANSAC homographies are unbounded, so no
    static kernel-band dispatch is possible in-graph) and the
    weight/value accumulators psum over 'data'; the first return is
    then the FINAL [f*H, f*W, 3] image.

    Feature parity with the single-chip pipeline (r3 VERDICT item 2):

    - ``scale_hw``: the DETECTION grid (keypoint scale-down path,
      src/lib.rs:355-601) — ``ref_feats`` must be detected at the same
      grid; homographies are rescaled (src/utils.rs:218-248) before
      the full-res warp.
    - ``det_mask``: cv2 detectAndCompute's detection mask at the
      detection grid, replicated (prepare with
      ``models.keypoint._prepare_det_mask``).
    - ``border_mode`` / ``border_value``: the stage-3 warp's border
      (KeyPointMatchParameters fields).  constant/transparent run the
      fused fast path; index-mapping modes (replicate/reflect/wrap)
      take the exact XLA warp in-graph (the apron trick needs a
      host-side data-dependent pad).
    - ``lane_valid`` ([N] bool): padding mask, as in
      :func:`ecc_stack_step`.
    - ``return_extras``: also return (match_counts [N],
      inlier_counts [N]).

    Built once per (mesh, config) and jit-wrapped, like
    :func:`ecc_stack_step` (eager shard_map recompiles per call on the
    TPU backend — the un-jitted keypoint module took >25 min there).
    """
    from ..ops import warp as warp_ops

    if stacking not in ("mean", "sigma_clip"):
        raise ValueError(
            f"stacking must be 'mean' or 'sigma_clip', got {stacking!r}"
        )
    border, _ = warp_ops._resolve_border(border_mode, 0.0)
    if stacking == "sigma_clip" and border not in (
        "constant", "transparent"
    ):
        raise ValueError(
            "stacking='sigma_clip' requires BORDER_CONSTANT or "
            f"BORDER_TRANSPARENT, got border mode {border!r}"
        )
    if output_scale > 1 and (
        stacking != "mean" or border not in ("constant", "transparent")
    ):
        raise ValueError(
            "output_scale > 1 requires stacking='mean' and "
            "BORDER_CONSTANT/TRANSPARENT"
        )
    n = frames_u8.shape[0]
    if scale_hw is not None:
        scale_hw = (int(scale_hw[0]), int(scale_hw[1]))
    ndata = mesh.shape["data"]
    if n % ndata != 0:
        raise ValueError(f"N={n} must divide the data axis ({ndata})")
    fn = _keypoint_step_program(
        mesh, int(method), float(ransac_reproj_threshold),
        float(match_ratio), float(match_keep_ratio), int(max_iters),
        float(confidence), int(seed), stacking, float(sigma_kappa),
        int(sigma_iters), scale_hw, int(border_mode),
        tuple(float(v) for v in tuple(border_value)[:3]),
        det_mask is not None, lane_valid is not None,
        bool(return_extras), n // ndata, int(output_scale),
    )
    args = (frames_u8, ref_feats)
    if lane_valid is not None:
        args = args + (lane_valid,)
    if det_mask is not None:
        args = args + (det_mask,)
    return fn(*args)


def _kp_solve_local_fn(
    method: int,
    ransac_reproj_threshold: float,
    match_ratio: float,
    match_keep_ratio: float,
    max_iters: int,
    confidence: float,
    seed: int,
    scale_hw,
    n_loc: int,
):
    """Shared per-shard ORB/match/RANSAC solve closure (used by the
    stack program and by :func:`keypoint_solve_step`'s solve-only
    program): batched ORB on the local frames, Hamming 2-NN against the
    replicated reference features, ratio/sort/keep, vectorised RANSAC
    with per-lane fold_in keys (lane identity independent of the mesh
    layout), validity checks and the scale-down homography adjustment.
    Returns ``(hs_safe [n,3,3] full-res, oks [n], match_counts,
    inlier_counts)``."""
    from ..ops import matcher, orb, ransac as ransac_ops
    from ..ops import resize as resize_ops
    from .. import constants

    key = jax.random.PRNGKey(seed)

    def solve_local(frames_local, rfeats, valid_local, det_mask):
        h, w = frames_local.shape[1], frames_local.shape[2]
        grey = color.rgb_to_gray_u8(color.depth_reduce_u8(frames_local))
        if scale_hw is not None:
            grey = resize_ops.resize(grey, scale_hw, constants.INTER_AREA)
        feats = jax.vmap(
            lambda g: orb.orb_detect_and_compute(g, mask=det_mask)
        )(grey)
        didx = jax.lax.axis_index("data")

        def match_one(i_desc, i_valid, i_xy, lane):
            knn = matcher.knn_match2(
                rfeats.descriptors, i_desc, rfeats.valid, i_valid
            )
            filt = matcher.ratio_filter_sort_keep(
                knn, match_ratio, match_keep_ratio
            )
            src = rfeats.xy[filt.query_idx]
            dst = i_xy[filt.train_idx]
            enough = filt.count >= 5  # ref src/lib.rs:240-242
            subkey = jax.random.fold_in(key, didx * n_loc + lane)
            res = ransac_ops.find_homography(
                dst, src, filt.keep, subkey,
                method=method,
                reproj_threshold=ransac_reproj_threshold,
                max_iters=max_iters, confidence=confidence,
            )
            det = jnp.linalg.det(res.h)
            ok = enough & res.ok & (jnp.abs(det) >= 1e-6)
            return res.h, ok, filt.count, res.num_inliers

        hs_l, oks_l, mc_l, ic_l = jax.vmap(match_one)(
            feats.descriptors, feats.valid, feats.xy,
            jnp.arange(n_loc),
        )
        if valid_local is not None:
            oks_l = oks_l & valid_local
        if scale_hw is not None:
            from ..models.keypoint import _adjust_h_for_scale

            hs_l = _adjust_h_for_scale(hs_l, scale_hw, (h, w))
        hs_safe = jnp.where(
            oks_l[:, None, None], hs_l, jnp.eye(3, dtype=hs_l.dtype)
        )
        return hs_safe, oks_l, mc_l, ic_l

    return solve_local


def keypoint_solve_step(
    frames_u8: jnp.ndarray,
    ref_feats,
    mesh: Mesh,
    method: int = 8,
    ransac_reproj_threshold: float = 5.0,
    match_ratio: float = 0.9,
    match_keep_ratio: float = 0.8,
    max_iters: int = 2000,
    confidence: float = 0.995,
    seed: int = 0,
    scale_hw=None,
    det_mask: Optional[jnp.ndarray] = None,
    lane_valid: Optional[jnp.ndarray] = None,
):
    """Sharded keypoint SOLVE only (no stacking): the streaming
    sigma-clip pipelines need the homographies themselves — the moment
    sweeps warp the burst later, in their own sharded passes.  Returns
    ``(hs [N,3,3] full-res replicated, ok [N], match_counts [N],
    inlier_counts [N])`` as host numpy."""
    n = frames_u8.shape[0]
    ndata = mesh.shape["data"]
    if n % ndata != 0:
        raise ValueError(f"N={n} must divide the data axis ({ndata})")
    if scale_hw is not None:
        scale_hw = (int(scale_hw[0]), int(scale_hw[1]))
    fn = _keypoint_solve_program(
        mesh, int(method), float(ransac_reproj_threshold),
        float(match_ratio), float(match_keep_ratio), int(max_iters),
        float(confidence), int(seed), scale_hw,
        det_mask is not None, lane_valid is not None, n // ndata,
    )
    args = (frames_u8, ref_feats)
    if lane_valid is not None:
        args = args + (lane_valid,)
    if det_mask is not None:
        args = args + (det_mask,)
    hs, ok, mc, ic = fn(*args)
    return (
        np.asarray(jax.device_get(hs)),
        np.asarray(jax.device_get(ok), bool),
        np.asarray(jax.device_get(mc)),
        np.asarray(jax.device_get(ic)),
    )


@functools.lru_cache(maxsize=64)
def _keypoint_solve_program(
    mesh: Mesh,
    method: int,
    ransac_reproj_threshold: float,
    match_ratio: float,
    match_keep_ratio: float,
    max_iters: int,
    confidence: float,
    seed: int,
    scale_hw,
    has_det_mask: bool,
    has_valid: bool,
    n_loc: int,
):
    """Solve-only sharded keypoint program: the shared local solve plus
    all_gathers of the (tiny) homographies and per-lane stats."""
    solve_local = _kp_solve_local_fn(
        method, ransac_reproj_threshold, match_ratio, match_keep_ratio,
        max_iters, confidence, seed, scale_hw, n_loc,
    )

    def local_step(frames_local, rfeats, valid_local, det_mask):
        hs, oks, mc, ic = solve_local(
            frames_local, rfeats, valid_local, det_mask
        )
        return tuple(
            jax.lax.all_gather(x, "data", tiled=True)
            for x in (hs, oks, mc, ic)
        )

    if has_valid and has_det_mask:
        wrapped = local_step
        specs = (P("data"), P(), P("data"), P())
    elif has_valid:
        wrapped = lambda f, r, v: local_step(f, r, v, None)
        specs = (P("data"), P(), P("data"))
    elif has_det_mask:
        wrapped = lambda f, r, m: local_step(f, r, None, m)
        specs = (P("data"), P(), P())
    else:
        wrapped = lambda f, r: local_step(f, r, None, None)
        specs = (P("data"), P())
    return jax.jit(shard_map(
        wrapped,
        mesh=mesh,
        in_specs=specs,
        out_specs=tuple([P()] * 4),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=32)
def _stream_moments_program(
    mesh: Mesh,
    perspective: bool,
    allow_pallas: bool,
    pallas_k: int,
    tile_rows: int,
    fused: bool,
    clipped: bool,
):
    """One sharded moment sweep over a streaming chunk (r4 VERDICT item
    3, stream x mesh with sigma-clip): each shard re-warps its local
    lanes and the per-pixel moment accumulators psum over 'data' —
    the host accumulates across chunks exactly like the single-device
    ``models.ecc._stream_sigma_stack`` sweeps."""
    from ..ops import stack as stack_ops

    def local(frames_local, mats_local, oks_local, *extra):
        fn = (
            stack_ops._clipped_chunk if clipped
            else stack_ops._moments_chunk
        )
        out = fn(
            frames_local, mats_local, oks_local, *extra,
            perspective=perspective, allow_pallas=allow_pallas,
            pallas_k=pallas_k, pallas_tile_rows=tile_rows, fused=fused,
        )
        return tuple(jax.lax.psum(o, "data") for o in out)

    in_specs = (P("data"), P("data"), P("data"))
    if clipped:
        in_specs = in_specs + (P(), P())
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=tuple([P()] * 3),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=128)
def _keypoint_step_program(
    mesh: Mesh,
    method: int,
    ransac_reproj_threshold: float,
    match_ratio: float,
    match_keep_ratio: float,
    max_iters: int,
    confidence: float,
    seed: int,
    stacking: str,
    sigma_kappa: float,
    sigma_iters: int,
    scale_hw,
    border_mode: int,
    border_value,
    has_det_mask: bool,
    has_valid: bool,
    return_extras: bool,
    n_loc: int,
    output_scale: int = 1,
):
    """Build + jit the sharded keypoint step for one static config."""
    from ..ops import warp_pallas
    from ..ops import stack as stack_ops
    from ..ops.warp_batch import warp_accumulate_rgb, warp_frames_batch
    from ..ops import warp as warp_ops

    border, _ = warp_ops._resolve_border(border_mode, 0.0)
    bv = jnp.asarray(border_value, jnp.float32)
    if border == "transparent":
        # TRANSPARENT over a zero dst base is tap-wise CONSTANT 0
        bv = jnp.zeros(3, jnp.float32)
    solve_local = _kp_solve_local_fn(
        method, ransac_reproj_threshold, match_ratio, match_keep_ratio,
        max_iters, confidence, seed, scale_hw, n_loc,
    )

    def local_step(frames_local, rfeats, valid_local, det_mask):
        h, w = frames_local.shape[1], frames_local.shape[2]
        f32 = color.to_unit_f32(frames_local)
        hs_safe, oks_l, mc_l, ic_l = solve_local(
            frames_local, rfeats, valid_local, det_mask
        )
        minv = jnp.linalg.inv(hs_safe)
        in_band = warp_pallas.residual_domain_ok(minv, h, w, k=7, xp=jnp)
        fast_ok = jnp.all(in_band | ~oks_l)

        if output_scale > 1:
            # distributed super-resolution deposit (r4 VERDICT item 6):
            # XLA gather formulation, lane-chunked to bound the
            # [C,fH,fW,3] transients; weight/value grids psum over
            # 'data' and the finalisation runs on the replicated sums
            acc = None
            for s0 in range(0, n_loc, 2):
                sl = slice(s0, s0 + 2)
                part = stack_ops._sr_chunk(
                    frames_local[sl], hs_safe[sl], oks_l[sl],
                    factor=output_scale, kernel_sigma=0.3,
                    perspective=True, with_fallback=False,
                )
                acc = part if acc is None else tuple(
                    a + p for a, p in zip(acc, part)
                )
            av = jax.lax.psum(acc[0], "data")
            aw = jax.lax.psum(acc[1], "data")
            total = av / jnp.maximum(aw, 1e-6)[..., None]
        elif stacking == "sigma_clip":

            def fast_wf(args):
                f32_, hs_ = args
                return warp_frames_batch(
                    f32_, hs_, perspective=True, border_value=bv,
                    allow_pallas=True, pallas_k=7,
                )

            def exact_wf(args):
                f32_, hs_ = args
                return warp_frames_batch(
                    f32_, hs_, perspective=True, border_value=bv,
                    allow_pallas=False,
                )

            wf = jax.lax.cond(fast_ok, fast_wf, exact_wf, (f32, hs_safe))
            incl = (
                stack_ops._coverage(hs_safe, h, w, True)
                & oks_l[:, None, None]
            )
            total = _sharded_sigma_total(wf, incl, sigma_kappa, sigma_iters)
        elif border not in ("constant", "transparent"):
            # index-mapping border modes: exact XLA warp in-graph (no
            # host-side apron available under shard_map), masked sum —
            # identical semantics to the single-chip exact path
            warped = warp_frames_batch(
                f32, hs_safe, perspective=True, border_value=bv,
                allow_pallas=False, border_mode=border_mode,
            )
            valid = oks_l.astype(jnp.float32)[:, None, None, None]
            total = jax.lax.psum(jnp.sum(warped * valid, axis=0), "data")
        else:

            def fast_branch(args):
                frames_, hs_, oks_ = args
                return warp_accumulate_rgb(
                    frames_, hs_, oks_, perspective=True, border_value=bv,
                    allow_pallas=True, pallas_k=7,
                )

            def exact_branch(args):
                frames_, hs_, oks_ = args
                return warp_accumulate_rgb(
                    frames_, hs_, oks_, perspective=True, border_value=bv,
                    allow_pallas=False,
                )

            partial = jax.lax.cond(
                fast_ok, fast_branch, exact_branch,
                (frames_local, hs_safe, oks_l),
            )
            total = jax.lax.psum(partial, "data")
        ok = jax.lax.all_gather(oks_l, "data", tiled=True)
        if return_extras:
            mc_g = jax.lax.all_gather(mc_l, "data", tiled=True)
            ic_g = jax.lax.all_gather(ic_l, "data", tiled=True)
            return total, ok, mc_g, ic_g
        return total, ok

    if has_valid and has_det_mask:
        wrapped = local_step
        specs = (P("data"), P(), P("data"), P())
    elif has_valid:
        wrapped = lambda f, r, v: local_step(f, r, v, None)
        specs = (P("data"), P(), P("data"))
    elif has_det_mask:
        wrapped = lambda f, r, m: local_step(f, r, None, m)
        specs = (P("data"), P(), P())
    else:
        wrapped = lambda f, r: local_step(f, r, None, None)
        specs = (P("data"), P())
    nout = 4 if return_extras else 2
    return jax.jit(shard_map(
        wrapped,
        mesh=mesh,
        in_specs=specs,
        out_specs=tuple([P()] * nout),
        check_vma=False,  # psum/all_gather outputs are replicated by construction
    ))


def ecc_stack_step_spatial(
    frames_u8: jnp.ndarray,
    ref_u8: jnp.ndarray,
    mesh: Mesh,
    scale_hw,
    motion_type: MotionType = MotionType.Homography,
    num_iters: int = 50,
    eps: float = 1e-4,
    gauss_filt_size: int = 5,
    halo: int = 64,
    phase_init: bool = True,
):
    """End-to-end align+stack for frames too large for one chip: image
    ROWS live sharded on 'spatial' for the whole pipeline (r2 VERDICT
    item 8 — spatial sharding integrated, not a standalone helper).

    ``frames_u8``: [N,H,W,3] uint8, frames on 'data' and rows on
    'spatial' (``P('data','spatial')``).  ``ref_u8``: [H,W,3] uint8
    rows-sharded (``P('spatial')``).  ``scale_hw``: the (h_small,
    w_small) grid the ECC solve runs on (the scale-down path of
    src/lib.rs:849-1028 — the full-res image never needs to be whole on
    any chip; only the small solve grid is materialised per chip).

    Stages, all under ONE shard_map:
    - grayscale: elementwise, stays sharded;
    - INTER_AREA down-scale: the row mixing matrix is linear, so each
      shard contributes ``wy[:, own_rows] @ grey_local`` and a psum
      over 'spatial' reproduces the dense resize exactly (same
      fixed-point rounding applied after the column pass);
    - batched ECC on the small grid (in-graph ladder solve, replicated
      across 'spatial' members — the small grid is tiny);
    - warp upscaling (src/lib.rs:941-958 math) and the full-res warp
      via ppermute halo exchange: each shard resamples its own row band
      from ``halo`` exchanged boundary rows (displacements must stay
      within ``halo - 2`` rows — burst motion is a few pixels);
    - masked partial sums, psum over 'data'.

    Returns (stacked_sum [H,W,3] f32 rows-sharded, ok [N] bool).
    """
    nsp = mesh.shape["spatial"]
    n, h, w = frames_u8.shape[0], frames_u8.shape[1], frames_u8.shape[2]
    hs, ws = int(scale_hw[0]), int(scale_hw[1])
    if h % nsp != 0:
        raise ValueError(f"H={h} must divide the spatial axis ({nsp})")
    h_loc = h // nsp
    if halo > h_loc:
        raise ValueError(f"halo {halo} exceeds shard height {h_loc}")
    fn = _ecc_spatial_program(
        mesh, (hs, ws), motion_type, int(num_iters), float(eps),
        int(gauss_filt_size), int(halo), bool(phase_init), h, w,
    )
    return fn(frames_u8, ref_u8)


@functools.lru_cache(maxsize=64)
def _ecc_spatial_program(
    mesh: Mesh,
    scale_hw,
    motion_type: MotionType,
    num_iters: int,
    eps: float,
    gauss_filt_size: int,
    halo: int,
    phase_init: bool,
    h: int,
    w: int,
):
    """Build + jit the spatially-sharded ECC step for one static config
    (same rationale as :func:`_ecc_step_program`)."""
    from ..ops import resize as _resize

    nsp = mesh.shape["spatial"]
    hs, ws = scale_hw
    h_loc = h // nsp
    # INTER_AREA row-mixing weights [hs, H] (host constant)
    wy = jnp.asarray(_resize._area_weights(h, hs))
    wx = jnp.asarray(_resize._area_weights(w, ws))
    perspective = motion_type == MotionType.Homography
    sx_up = w / ws
    sy_up = h / hs

    def small_grey(grey_u8_local):
        """[..., h_loc, W] u8 grey -> [..., hs, ws] f32 small grey,
        exactly like the dense _ecc_grey_jit resize (round to u8 after
        both passes, then cast)."""
        idx = jax.lax.axis_index("spatial")
        wy_loc = jax.lax.dynamic_slice_in_dim(
            wy, idx * h_loc, h_loc, axis=1
        )  # [hs, h_loc]
        part = jnp.einsum(
            "ay,...yw->...aw", wy_loc, grey_u8_local.astype(jnp.float32),
            precision="highest",
        )
        rows = jax.lax.psum(part, "spatial")  # [..., hs, W]
        out = jnp.einsum(
            "bx,...ax->...ab", wx, rows, precision="highest"
        )
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255)
        return out  # f32 holding u8-rounded values (dense path parity)

    def vertical_disp_ok(minv_b):
        """Per-lane check of the halo correctness domain: the source
        row of EVERY output pixel must stay within ``halo - 2`` rows of
        its own position (bilinear support + centre slack).  Sampled on
        a 5x5 grid plus an 8-row margin for in-between variation (the
        graph solve's final domain check already bounds the in-tile
        spread to ~k+1 rows)."""
        ys = jnp.linspace(0.0, h - 1.0, 5)
        xs = jnp.linspace(0.0, w - 1.0, 5)
        py = jnp.repeat(ys, 5)[None, :]
        px = jnp.tile(xs, 5)[None, :]
        den = (minv_b[:, 2, 0, None] * px + minv_b[:, 2, 1, None] * py
               + minv_b[:, 2, 2, None])
        inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
        sy = (minv_b[:, 1, 0, None] * px + minv_b[:, 1, 1, None] * py
              + minv_b[:, 1, 2, None]) * inv
        dy = jnp.max(jnp.abs(sy - py), axis=1)
        return dy + 8.0 <= halo - 2.0

    def local_step(frames_local, ref_local):
        # frames_local: [n_loc, h_loc, W, 3]; ref_local: [h_loc, W, 3]
        idx = jax.lax.axis_index("spatial")
        grey_cur = color.rgb_to_gray_u8(color.depth_reduce_u8(frames_local))
        grey_ref = color.rgb_to_gray_u8(color.depth_reduce_u8(ref_local))
        small_cur = small_grey(grey_cur)
        small_ref = small_grey(grey_ref)
        n_loc = small_cur.shape[0]
        from ..ops.ecc import _MAX_SOLVE_LANES

        warp_init = None
        if phase_init:
            from ..ops import phasecorr

            warp_init = phasecorr.phase_init_warps(
                small_cur, small_ref, motion_type=motion_type
            )
        parts = [
            ecc_ops.find_transform_ecc_batched_graph(
                small_cur[s0 : s0 + _MAX_SOLVE_LANES], small_ref,
                motion_type=motion_type, num_iters=num_iters, eps=eps,
                gauss_filt_size=gauss_filt_size,
                warp_init=(
                    None if warp_init is None
                    else warp_init[s0 : s0 + _MAX_SOLVE_LANES]
                ),
            )
            for s0 in range(0, n_loc, _MAX_SOLVE_LANES)
        ]
        warps = jnp.concatenate([p.warp_matrix for p in parts])
        res_ok = jnp.concatenate([p.ok for p in parts])
        # upscale the warps estimated on the small grid
        # (ref src/lib.rs:941-958)
        warps = warps.at[:, 0, 2].mul(sx_up).at[:, 1, 2].mul(sy_up)
        if perspective:
            warps = warps.at[:, 2, 0].divide(sx_up)
            warps = warps.at[:, 2, 1].divide(sy_up)
        m3 = (
            warps if warps.shape[1] == 3
            else jax.vmap(warp.affine_to_3x3)(warps)
        )
        eye = jnp.eye(3, dtype=m3.dtype)
        m3 = jnp.where(res_ok[:, None, None], m3, eye)
        minv = jnp.linalg.inv(m3)
        # a converged warp whose vertical motion exceeds the halo would
        # silently sample zeros from the strip border: drop it instead
        # (reported in ok like any other per-frame failure)
        res_ok = res_ok & vertical_disp_ok(minv)
        minv = jnp.where(res_ok[:, None, None], minv, eye)

        # full-res rows-sharded warp: one batched halo exchange, then
        # per-frame resampling of the local row band from the extended
        # strip
        f32 = color.to_unit_f32(frames_local)  # [n_loc, h_loc, W, 3]
        up = [(i, (i + 1) % nsp) for i in range(nsp)]
        down = [(i, (i - 1) % nsp) for i in range(nsp)]
        top_halo = jax.lax.ppermute(f32[:, -halo:], "spatial", up)
        bot_halo = jax.lax.ppermute(f32[:, :halo], "spatial", down)
        ext = jnp.concatenate([top_halo, f32, bot_halo], axis=1)
        r = jnp.arange(ext.shape[1])
        bad = ((idx == 0) & (r < halo)) | (
            (idx == nsp - 1) & (r >= halo + h_loc)
        )
        ext = jnp.where(bad[None, :, None, None], 0.0, ext)
        row0 = (idx * h_loc).astype(jnp.float32)
        shift_out = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
            jnp.float32,
        ).at[1, 2].set(row0)
        shift_src = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
            jnp.float32,
        ).at[1, 2].set(-(row0 - halo))

        def warp_one(ext_f, mi):
            m_local = shift_src @ mi @ shift_out
            return warp.warp_perspective(
                ext_f, m_local, (h_loc, w), border_mode="constant",
                border_value=0.0, inverse_map=True,
            )

        warped = jax.vmap(warp_one)(ext, minv)
        valid = res_ok.astype(jnp.float32)[:, None, None, None]
        partial = jnp.sum(warped * valid, axis=0)
        total = jax.lax.psum(partial, "data") + color.to_unit_f32(ref_local)
        ok = jax.lax.all_gather(res_ok, "data", tiled=True)
        return total, ok

    return jax.jit(shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("data", "spatial"), P("spatial")),
        out_specs=(P("spatial"), P()),
        check_vma=False,
    ))


def warp_rows_sharded(
    frame: jnp.ndarray,  # [H, W] or [H, W, C] float32, rows on 'spatial'
    m3: jnp.ndarray,  # [3, 3] forward map (replicated)
    mesh: Mesh,
    halo: int = 64,
    perspective: bool = True,
) -> jnp.ndarray:
    """Warp one very large frame with its ROWS sharded over 'spatial':
    each shard exchanges ``halo`` boundary rows with both neighbours via
    ``ppermute`` and resamples its own row range from the extended
    strip — the 2-D analogue of context parallelism (SURVEY.md §5
    long-context note; extends the halo scheme beyond sharpness).

    Correctness domain: every output pixel's source row must lie within
    ``halo`` rows of its own position (|vertical displacement| <= halo
    - 1 after bilinear support).  Burst-alignment warps are a few
    pixels; raise ``halo`` for larger motion.  Out-of-domain taps fall
    to BORDER_CONSTANT 0 exactly like pixels mapping off-frame.
    """
    nsp = mesh.shape["spatial"]
    h = frame.shape[0]
    w = frame.shape[1]
    if h % nsp != 0:
        raise ValueError(f"H={h} must divide the spatial axis ({nsp})")
    h_loc = h // nsp
    if halo > h_loc:
        raise ValueError(f"halo {halo} exceeds shard height {h_loc}")
    minv = warp.invert_3x3(
        m3 if m3.shape == (3, 3) else warp.affine_to_3x3(m3)
    )
    return _warp_rows_program(mesh, int(halo), h, w)(frame, minv)


@functools.lru_cache(maxsize=64)
def _warp_rows_program(mesh: Mesh, halo: int, h: int, w: int):
    """Build + jit the rows-sharded warp for one static config (same
    rationale as :func:`_ecc_step_program`; the inverse map is an
    operand, not a closure constant, so the program is reusable across
    matrices)."""
    nsp = mesh.shape["spatial"]
    h_loc = h // nsp

    def local(rows_local, minv):
        idx = jax.lax.axis_index("spatial")
        up = [(i, (i + 1) % nsp) for i in range(nsp)]
        down = [(i, (i - 1) % nsp) for i in range(nsp)]
        top_halo = jax.lax.ppermute(rows_local[-halo:], "spatial", up)
        bot_halo = jax.lax.ppermute(rows_local[:halo], "spatial", down)
        ext = jnp.concatenate([top_halo, rows_local, bot_halo], axis=0)
        # zero the wrapped halos at the global top/bottom edges so they
        # behave like BORDER_CONSTANT outside the frame
        r = jnp.arange(ext.shape[0])
        top_bad = (idx == 0) & (r < halo)
        bot_bad = (idx == nsp - 1) & (r >= halo + h_loc)
        bad = (top_bad | bot_bad)
        ext = jnp.where(
            bad[:, None] if ext.ndim == 2 else bad[:, None, None], 0.0, ext
        )
        # output row y_global = idx*h_loc + y_local; the extended strip
        # starts at global row idx*h_loc - halo.  Shift the inverse map
        # into strip coordinates on both sides.
        row0 = (idx * h_loc).astype(jnp.float32)
        shift_out = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, row0], [0.0, 0.0, 1.0]],
            jnp.float32,
        )  # local out coords -> global out coords
        shift_src = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, -(row0 - halo)], [0.0, 0.0, 1.0]],
            jnp.float32,
        )  # global src coords -> strip coords
        m_local = shift_src @ minv @ shift_out
        out = warp.warp_perspective(
            ext, m_local, (h_loc, w), border_mode="constant",
            border_value=0.0, inverse_map=True,
        )
        # taps whose GLOBAL source row left the halo band read zeros from
        # the strip border; that matches BORDER_CONSTANT only when the
        # caller respects the halo domain (documented above)
        return out

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("spatial"), P()),
        out_specs=P("spatial"),
        check_vma=False,
    ))


def sharpness_teng_spatial(
    frames: jnp.ndarray, mesh: Mesh, k_size: int = 3
) -> jnp.ndarray:
    """Tenengrad sharpness with the frame axis on 'data' AND image rows on
    'spatial': each shard exchanges a halo of (k_size-1)/2 rows with its
    spatial neighbours via ``ppermute`` so the Sobel window is exact at
    shard boundaries — spatial sharding with halo exchange (SURVEY.md §5).

    ``frames``: [N,H,W] float32. Returns [N] sharpness scores.
    """
    h, w = frames.shape[-2], frames.shape[-1]
    return _sharpness_teng_program(mesh, int(k_size))(frames) / (h * w)


@functools.lru_cache(maxsize=16)
def _sharpness_teng_program(mesh: Mesh, k_size: int):
    """Build + jit the spatially-sharded Tenengrad program (same
    rationale as :func:`_ecc_step_program`)."""
    r = len(filters.deriv_kernel(1, k_size)) // 2
    nsp = mesh.shape["spatial"]

    def local(frames_local):
        # frames_local: [n_loc, h_loc, W]
        idx = jax.lax.axis_index("spatial")
        up = [(i, (i + 1) % nsp) for i in range(nsp)]
        down = [(i, (i - 1) % nsp) for i in range(nsp)]
        # halo from the previous shard's last rows and next shard's first rows
        top_halo = jax.lax.ppermute(frames_local[:, -r:, :], "spatial", up)
        bot_halo = jax.lax.ppermute(frames_local[:, :r, :], "spatial", down)
        x = jnp.concatenate([top_halo, frames_local, bot_halo], axis=1)
        gx = filters.sobel(x, 1, 0, ksize=k_size, border="reflect101")
        gy_full = filters.sobel(x, 0, 1, ksize=k_size, border="reflect101")
        # interior rows are exact; boundary shards fix edges below
        gx = gx[:, r:-r, :]
        gy = gy_full[:, r:-r, :]
        # Recompute true top/bottom borders on the edge shards with the
        # reflect-101 rule applied to the *global* image edge.
        is_top = idx == 0
        is_bot = idx == nsp - 1
        local_nohalo_gx = filters.sobel(frames_local, 1, 0, ksize=k_size)
        local_nohalo_gy = filters.sobel(frames_local, 0, 1, ksize=k_size)
        row_ids = jnp.arange(frames_local.shape[1])[None, :, None]
        top_rows = row_ids < r
        bot_rows = row_ids >= frames_local.shape[1] - r
        gx = jnp.where(is_top & top_rows, local_nohalo_gx, gx)
        gy = jnp.where(is_top & top_rows, local_nohalo_gy, gy)
        gx = jnp.where(is_bot & bot_rows, local_nohalo_gx, gx)
        gy = jnp.where(is_bot & bot_rows, local_nohalo_gy, gy)
        s = jnp.sum(gx * gx + gy * gy, axis=(1, 2))
        s = jax.lax.psum(s, "spatial")
        return jax.lax.all_gather(s, "data", tiled=True)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", "spatial", None),),
        out_specs=P(),
        check_vma=False,
    ))
