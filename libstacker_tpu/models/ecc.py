"""``ecc_match`` pipeline — ECC-aligned burst stacking.

Counterpart of the reference's ``ecc_match`` dispatcher and its two
pipelines (``src/lib.rs:702-717``, ``ecc_match_no_scaling``
src/lib.rs:719-847, ``ecc_match_scaling_down`` src/lib.rs:849-1028),
redesigned TPU-first:

- frames are decoded on host into one ``[N,H,W,3] uint8`` tensor and
  shipped to HBM once;
- grayscale conversion, optional INTER_AREA scale-down, batched ECC
  solve, full-res warp and stack accumulation all run as jitted device
  programs over the whole burst (the Rayon fold/reduce at
  src/lib.rs:746-833 becomes a masked mean over the frame axis);
- the per-frame ECC convention is preserved exactly: template = current
  frame's grey, input = frame 0's grey (src/lib.rs:769-777), then the
  resulting warp is applied *forward* (non-inverse) to the current
  frame (src/lib.rs:780-803) with BORDER_CONSTANT 0;
- normalisation divides by the total frame count (src/lib.rs:837), and
  any per-frame ECC failure raises ProcessingError like the reference's
  ``?`` abort — or drops the frame when ``on_failure="drop"`` (flagged
  deviation, SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import InvalidParamsError, NotEnoughFilesError, ProcessingError
from ..params import EccMatchParameters, MotionType
from ..ops import color, ecc as ecc_ops, resize, warp
from ..ops.warp_batch import warp_accumulate_rgb
from ..utils import io


def _solver_mode(params) -> Optional[str]:
    """EccMatchParameters.solver -> find_transform_ecc_batched's
    ``mode``.  The dataclass default 'forward' maps to None so the
    LIBSTACKER_ECC_MODE env override can flip the formulation without
    touching params; an explicit solver='ic' always wins."""
    s = getattr(params, "solver", "forward")
    return s if s != "forward" else None


def _adjust_warp_for_scale(
    warps: jnp.ndarray,
    motion_type: MotionType,
    small_hw,
    full_hw,
) -> jnp.ndarray:
    """Upscale warp matrices estimated on scaled-down frames.

    Non-homography: scale the translation column by full/small ratios
    (ref src/lib.rs:941-951).  Homography: the f32 variant of
    ``adjust_homography_for_scale`` (ref src/lib.rs:952-958,
    src/utils.rs:218-248)."""
    sx = full_hw[1] / small_hw[1]
    sy = full_hw[0] / small_hw[0]
    if motion_type != MotionType.Homography:
        return warps.at[..., 0, 2].mul(sx).at[..., 1, 2].mul(sy)
    w = warps
    w = w.at[..., 0, 2].mul(sx)
    w = w.at[..., 1, 2].mul(sy)
    w = w.at[..., 2, 0].divide(sx)
    w = w.at[..., 2, 1].divide(sy)
    return w


@functools.partial(jax.jit, static_argnames=("scale_hw",))
def _ecc_grey_jit(frames_u8: jnp.ndarray, scale_hw: Optional[tuple] = None):
    """Stage 1: grayscale (raw 0..255 f32) + optional INTER_AREA
    scale-down of the whole burst.

    The resize runs on the uint8 grey and is rounded back to uint8
    BEFORE the float cast, matching the reference's scale_image of the
    uint8 grey Mat (src/lib.rs:918-920, src/utils.rs:204-211) —
    resizing in float would drift from the oracle by up to 1 LSB.

    uint16 bursts solve on their high-byte reduction (bit-identical
    warps to the equivalent 8-bit burst; see color.depth_reduce_u8) —
    only the stacking stage sees the full depth."""
    grey = color.rgb_to_gray_u8(color.depth_reduce_u8(frames_u8))
    if scale_hw is not None:
        grey = resize.resize(grey, scale_hw, interpolation=3)
    return grey.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("scale_hw",))
def _ecc_mask_jit(mask, scale_hw: Optional[tuple] = None):
    """Binarise the user's reference-frame mask (nonzero = valid) and,
    on the scaled path, shrink it conservatively to the solve grid (a
    scaled pixel stays valid only if >= half its INTER_AREA footprint
    was)."""
    m = (mask > 0).astype(jnp.float32)
    if scale_hw is not None:
        m = (resize.resize(m, scale_hw, interpolation=3) >= 0.5).astype(
            jnp.float32
        )
    return m


@functools.partial(
    jax.jit,
    static_argnames=("motion_type", "scale_hw", "allow_pallas", "pallas_k",
                     "pallas_tile_rows"),
)
def _ecc_warp_accumulate_jit(
    frames_u8: jnp.ndarray,
    warps: jnp.ndarray,
    oks: jnp.ndarray,
    motion_type: MotionType,
    scale_hw: Optional[tuple] = None,
    allow_pallas: bool = True,
    pallas_k: int = 7,
    pallas_tile_rows: int = 128,
):
    """Stage 3: rescale warps if estimated on scaled greys
    (ref src/lib.rs:941-958), warp every frame onto frame 0's grid
    (forward application, BORDER_CONSTANT 0 — ref src/lib.rs:780-803),
    masked sum over frames.  ``allow_pallas`` is the host-computed
    kernel-domain dispatch decision (ops.warp_batch)."""
    h, w = frames_u8.shape[1], frames_u8.shape[2]
    frames_f32 = color.to_unit_f32(frames_u8)
    if scale_hw is not None:
        warps = _adjust_warp_for_scale(warps, motion_type, scale_hw, (h, w))
    # failed lanes contribute nothing; keep their (frozen, finite) warps
    # out of the kernel anyway in case of NaN
    eye = jnp.eye(3, dtype=warps.dtype)[: warps.shape[1]]
    warps = jnp.where(oks[:, None, None], warps, eye)
    perspective = motion_type == MotionType.Homography
    return frames_f32[0] + warp_accumulate_rgb(
        frames_f32[1:], warps, oks, perspective=perspective,
        allow_pallas=allow_pallas, pallas_k=pallas_k,
        pallas_tile_rows=pallas_tile_rows,
    )


def _warp_pick_k_host(
    warps, oks, motion_type: MotionType, scale_hw, full_hw
):
    """Host-side Pallas dispatch decision for stage 3: adjust the kept
    lanes' warps for scale exactly like the jitted stage will, then pick
    the cheapest kernel (k, tile_rows) config covering them (None ->
    XLA path; see ops.warp_batch.pallas_pick_config — the tile-shrink
    rungs keep large legitimate rotations at kernel speed)."""
    from ..ops import warp_batch

    m = np.asarray(jax.device_get(warps), np.float64)
    ok = np.asarray(oks)
    m = m[ok]
    if m.shape[0] == 0:
        return warp_batch.pallas_pick_config(m[:0], full_hw[0], full_hw[1])
    if scale_hw is not None:
        sx = full_hw[1] / scale_hw[1]
        sy = full_hw[0] / scale_hw[0]
        m[:, 0, 2] *= sx
        m[:, 1, 2] *= sy
        if motion_type == MotionType.Homography:
            m[:, 2, 0] /= sx
            m[:, 2, 1] /= sy
    return warp_batch.pallas_pick_config(m, full_hw[0], full_hw[1])


def ecc_stack_step_graph(
    frames_u8: jnp.ndarray,
    motion_type: MotionType,
    num_iters: int,
    eps: float,
    gauss_filt_size: int,
):
    """Fully in-graph align+stack step (jittable end to end) — used for
    compile checks and small workloads; production pipelines go through
    the host-slabbed path in :func:`ecc_match_arrays`."""
    n, h, w = frames_u8.shape[0], frames_u8.shape[1], frames_u8.shape[2]
    grey = color.rgb_to_gray_u8(
        color.depth_reduce_u8(frames_u8)
    ).astype(jnp.float32)
    result = ecc_ops.find_transform_ecc_batched_graph(
        grey[1:], grey[0],
        motion_type=motion_type, num_iters=num_iters, eps=eps,
        gauss_filt_size=gauss_filt_size,
    )
    stacked_sum = _ecc_warp_accumulate_jit(
        frames_u8, result.warp_matrix, result.ok, motion_type=motion_type
    )
    return stacked_sum, result.ok, result.rho, result.num_iters


def ecc_match_arrays(
    frames: np.ndarray,
    params: EccMatchParameters,
    scale_down_width: Optional[float] = None,
    on_failure: str = "raise",
    return_stats: bool = False,
    mask: Optional[np.ndarray] = None,
):
    """Array-based ``ecc_match``: ``frames`` is ``[N,H,W,3] uint8`` RGB.

    Returns the stacked ``[H,W,3] float32`` RGB image in [0,1]
    (frame 0's grid), like the reference returns a CV_32F Mat
    (src/lib.rs:836-846).  With ``params.output_scale = f > 1`` the
    output grid is ``[f*H, f*W, 3]`` (super-resolution stack).

    ``mask`` ([H,W], nonzero = valid) excludes reference-frame pixels
    from the alignment (cv2.findTransformECC's ``inputMask`` — frame 0
    is the ECC input image in this pipeline's convention): moving
    subjects, lens dirt or dead sensor regions stop perturbing the
    solved warps.  Stacking is unaffected — every output pixel still
    averages all frames.  Masked solves disable the phase-correlation
    warm start (the whole-frame FFT would see the masked content) and
    run identity-initialised like OpenCV.
    """
    params.validate()
    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise InvalidParamsError(
            f"frames must be [N,H,W,3] uint8/uint16, got {frames.shape}"
        )
    if frames.dtype not in (np.uint8, np.uint16):
        raise InvalidParamsError(
            f"frames must be uint8 or uint16, got {frames.dtype}"
        )
    n, h, w = frames.shape[:3]
    if n == 0:
        raise NotEnoughFilesError()
    num_iters, eps = params.resolve_criteria()

    scale_hw = None
    if scale_down_width is not None:
        if scale_down_width >= w:
            raise InvalidParamsError(
                "scale_down_to was larger (or equal) to the full image "
                f"width: full_size:{w}, scale_down_to:{scale_down_width}"
            )
        if scale_down_width <= 10.0:
            raise InvalidParamsError(
                f"scale_down_to was too small scale_down_to:{scale_down_width}"
            )
        scale_hw = resize.scale_image_size(h, w, scale_down_width)

    if n == 1:
        # reference: stacked = sum / 1 = frame 0 (src/lib.rs:836-843)
        from .keypoint import _single_frame_out

        out = _single_frame_out(frames[0], params)
        if return_stats:
            from ..utils.tracing import PipelineStats

            return out, PipelineStats(frames_total=1, frames_kept=1,
                                      frames_dropped=0)
        return out

    frames_j = jnp.asarray(frames)
    grey = _ecc_grey_jit(frames_j, scale_hw=scale_hw)
    input_mask = None
    if mask is not None:
        mask = np.asarray(mask)
        if mask.ndim == 3 and mask.shape[-1] == 1:
            mask = mask[..., 0]
        if mask.shape != (h, w):
            raise InvalidParamsError(
                f"mask must be [H,W] matching the frames, got {mask.shape}"
                f" for frames {(h, w)}"
            )
        input_mask = _ecc_mask_jit(jnp.asarray(mask), scale_hw=scale_hw)
    warp_init = None
    if getattr(params, "phase_init", False) and input_mask is None:
        from ..ops import phasecorr

        warp_init = phasecorr.phase_init_warps(
            grey[1:], grey[0], motion_type=params.motion_type,
            rotation=getattr(params, "phase_init_rotation", False),
        )
    result = ecc_ops.find_transform_ecc_batched(
        grey[1:],
        grey[0],
        motion_type=params.motion_type,
        num_iters=num_iters,
        eps=eps,
        gauss_filt_size=params.gauss_filt_size,
        coarse_levels=getattr(params, "coarse_levels", 0),
        warp_init=warp_init,
        mode=_solver_mode(params),
        input_mask=input_mask,
    )
    # speculative k=1 stage 3 (same trick as the keypoint pipelines):
    # dispatch the common-case band before the warp matrices cross to
    # the host for the domain check — converged ECC warps that rode the
    # solve's k=1 band almost always stack at k=1 too
    from ..ops.warp_batch import _pallas_usable

    sigma = getattr(params, "stacking", "mean") == "sigma_clip"
    sr_factor = getattr(params, "output_scale", 1)
    speculate = _pallas_usable(h, w) and not sigma and sr_factor == 1
    spec_sum = None
    if speculate:
        spec_sum = _ecc_warp_accumulate_jit(
            frames_j, result.warp_matrix, result.ok,
            motion_type=params.motion_type, scale_hw=scale_hw,
            allow_pallas=True, pallas_k=1,
        )
    # the Pallas-dispatch pick needs a blocking device_get of the warp
    # matrices — skip it on the SR path, which never reads cfg
    cfg = None
    if sr_factor == 1:
        cfg = _warp_pick_k_host(
            result.warp_matrix, result.ok, params.motion_type, scale_hw,
            (h, w),
        )
    if sr_factor > 1:
        # beyond-reference super-resolution stack (ops/stack.py)
        from ..ops import stack as stack_ops

        warps_full = jnp.asarray(result.warp_matrix)
        if scale_hw is not None:
            warps_full = _adjust_warp_for_scale(
                warps_full, params.motion_type, scale_hw, (h, w)
            )
        stacked_img = stack_ops.super_res_stack(
            frames_j, warps_full, result.ok, factor=sr_factor,
            perspective=params.motion_type == MotionType.Homography,
        )
    elif sigma:
        # beyond-reference robust stack (ops/stack.py): per-pixel
        # kappa-sigma outlier rejection over the re-warped burst
        from ..ops import stack as stack_ops

        warps_full = jnp.asarray(result.warp_matrix)
        if scale_hw is not None:
            warps_full = _adjust_warp_for_scale(
                warps_full, params.motion_type, scale_hw, (h, w)
            )
        stacked_img, clip_frac = stack_ops.kappa_sigma_stack(
            frames_j, warps_full, result.ok,
            perspective=params.motion_type == MotionType.Homography,
            kappa=params.sigma_kappa, iters=params.sigma_iters,
            allow_pallas=cfg is not None,
            pallas_k=cfg[0] if cfg else 7,
            pallas_tile_rows=cfg[1] if cfg else 128,
        )
    elif speculate and cfg == (1, 128):
        stacked_sum = spec_sum
    else:
        stacked_sum = _ecc_warp_accumulate_jit(
            frames_j,
            result.warp_matrix,
            result.ok,
            motion_type=params.motion_type,
            scale_hw=scale_hw,
            allow_pallas=cfg is not None,
            pallas_k=cfg[0] if cfg else 7,
            pallas_tile_rows=cfg[1] if cfg else 128,
        )
    ok = np.asarray(result.ok)
    stats = None
    if return_stats:
        from ..utils.tracing import PipelineStats

        stats = PipelineStats(
            frames_total=n,
            frames_kept=1 + int(ok.sum()),
            frames_dropped=int((~ok).sum()),
            ecc_iterations=np.asarray(result.num_iters).tolist(),
            ecc_rho=np.asarray(result.rho).tolist(),
            clipped_sample_frac=clip_frac if sigma else None,
        )
    if not ok.all():
        bad = np.nonzero(~ok)[0] + 1
        if on_failure == "raise":
            raise ProcessingError(
                "findTransformECC failed to converge for frames "
                f"{bad.tolist()} (NaN correlation or non-positive lambda "
                "denominator)"
            )
        if sigma or sr_factor > 1:  # failed lanes already excluded
            out = np.asarray(stacked_img)
            return (out, stats) if return_stats else out
        # drop mode: failed frames contributed nothing to the sum
        count = 1 + int(ok.sum())
        out = np.asarray(stacked_sum) / count
        return (out, stats) if return_stats else out
    out = (
        np.asarray(stacked_img)
        if (sigma or sr_factor > 1)
        else np.asarray(stacked_sum) / n
    )
    return (out, stats) if return_stats else out


def ecc_match(
    files: Sequence,
    params: EccMatchParameters,
    scale_down_width: Optional[float] = None,
    on_failure: str = "raise",
    return_stats: bool = False,
    mask: Optional[np.ndarray] = None,
    preserve_depth: bool = False,
):
    """Align and stack image files with ECC (ref src/lib.rs:702-717).

    Returns the stacked ``[H,W,3] float32`` RGB image in [0,1]
    (plus a PipelineStats record when ``return_stats``).  ``mask``
    excludes reference-frame pixels from the alignment (see
    :func:`ecc_match_arrays`).  ``preserve_depth`` decodes 16-bit
    files to uint16 and stacks at full depth (alignment is unchanged;
    pair with ``utils.io.save_image(..., bit_depth=16)``).
    """
    frames = io.load_frames(files, preserve_depth=preserve_depth)
    return ecc_match_arrays(
        frames, params, scale_down_width, on_failure, return_stats,
        mask=mask,
    )


def ecc_match_stream(
    files: Sequence,
    params: EccMatchParameters,
    scale_down_width: Optional[float] = None,
    chunk_size: int = 16,
    on_failure: str = "raise",
    mask: Optional[np.ndarray] = None,
    preserve_depth: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 4,
    return_stats: bool = False,
):
    """Streaming ``ecc_match`` for bursts larger than HBM: frames are
    decoded, aligned and accumulated in chunks of ``chunk_size`` against
    frame 0; only the running sum stays resident (the reference's
    "memory efficient streaming processing" claim, src/lib.rs:106,
    realised as chunked device accumulation — SURVEY.md §5
    checkpoint/streaming note).  Chunks are host-decoded one step ahead
    on a background thread, and the final partial chunk is padded to
    ``chunk_size`` so no per-burst-length recompile ever happens.

    ``checkpoint_path`` makes the run RESUMABLE: every
    ``checkpoint_every`` chunks the accumulator + ok flags are written
    atomically (utils.checkpoint), and a rerun of the same burst picks
    up at the last saved chunk instead of frame 0.  The file is keyed
    to the file list/params/mask (a mismatched checkpoint is ignored)
    and removed on success.  Each save syncs the device accumulator —
    pick ``checkpoint_every`` high enough that the sync cost amortises.
    """
    params.validate()
    if (getattr(params, "stacking", "mean") != "mean"
            or getattr(params, "output_scale", 1) != 1):
        raise InvalidParamsError(
            "sigma_clip / output_scale stacking is not available in the"
            " streaming pipelines; use the whole-burst entry points"
        )
    files = io.normalize_files(files)
    if not files:
        raise NotEnoughFilesError()
    num_iters, eps = params.resolve_criteria()

    ref = io.load_frames(files[:1], preserve_depth=preserve_depth)
    n_total = len(files)
    h, w = ref.shape[1:3]
    scale_hw = None
    if scale_down_width is not None:
        if scale_down_width >= w:
            raise InvalidParamsError(
                "scale_down_to was larger (or equal) to the full image "
                f"width: full_size:{w}, scale_down_to:{scale_down_width}"
            )
        if scale_down_width <= 10.0:
            raise InvalidParamsError(
                f"scale_down_to was too small scale_down_to:{scale_down_width}"
            )
        scale_hw = resize.scale_image_size(h, w, scale_down_width)

    ref_j = jnp.asarray(ref)
    ref_grey = _ecc_grey_jit(ref_j, scale_hw=scale_hw)[0]
    input_mask = None
    if mask is not None:
        mask = np.asarray(mask)
        if mask.ndim == 3 and mask.shape[-1] == 1:
            mask = mask[..., 0]
        if mask.shape != (h, w):
            raise InvalidParamsError(
                f"mask must be [H,W] matching the frames, got {mask.shape}"
                f" for frames {(h, w)}"
            )
        input_mask = _ecc_mask_jit(jnp.asarray(mask), scale_hw=scale_hw)
    acc = color.to_unit_f32(ref_j[0])
    all_ok = []
    all_iters = []
    all_rho = []
    ckpt = None
    chunks_done = 0
    if checkpoint_path is not None:
        from ..utils import checkpoint as ckpt_mod

        ckpt = ckpt_mod.StreamCheckpoint(
            checkpoint_path,
            ckpt_mod.burst_key(files, params, scale_down_width,
                               chunk_size, extra="ecc", mask=mask),
        )
        chunks_done, state = ckpt.load()
        if state is not None and chunks_done > 0:
            acc = jnp.asarray(state["acc"])
            if state["ok"].size:
                all_ok.append(state["ok"].astype(bool))
            if state.get("iters") is not None and state["iters"].size:
                all_iters.append(state["iters"])
                all_rho.append(state["rho"])
    # True async H2D double-buffering (SURVEY §7 phase 6): the NEXT
    # chunk's device_put is issued before this chunk's solve dispatches,
    # so the upload rides the transfer engine while the solve runs
    # (decode-ahead already overlaps on a host thread in
    # io.prefetched_chunks).  Tail pads are the REFERENCE frame, whose
    # lanes converge in ~2 iterations (see io.pad_chunk).
    gen = io.prefetched_chunks(
        files, chunk_size, h, w, start=1 + chunks_done * chunk_size,
        preserve_depth=preserve_depth,
    )

    def put_next():
        frames = next(gen, None)
        if frames is None:
            return None
        return (
            jax.device_put(io.pad_chunk(frames, chunk_size, fill=ref[0])),
            frames.shape[0],
        )

    cur = put_next()
    while cur is not None:
        frames_j, n_real = cur
        cur = put_next()
        grey = _ecc_grey_jit(frames_j, scale_hw=scale_hw)
        warp_init = None
        if getattr(params, "phase_init", False) and input_mask is None:
            from ..ops import phasecorr

            warp_init = phasecorr.phase_init_warps(
                grey, ref_grey, motion_type=params.motion_type,
                rotation=getattr(params, "phase_init_rotation", False),
            )
        result = ecc_ops.find_transform_ecc_batched(
            grey,
            ref_grey,
            motion_type=params.motion_type,
            num_iters=num_iters,
            eps=eps,
            gauss_filt_size=params.gauss_filt_size,
            coarse_levels=getattr(params, "coarse_levels", 0),
            warp_init=warp_init,
            mode=_solver_mode(params),
            input_mask=input_mask,
        )
        real = jnp.arange(chunk_size) < n_real
        ok_lane = result.ok & real
        cfg = _warp_pick_k_host(
            result.warp_matrix, ok_lane, params.motion_type, scale_hw,
            (h, w),
        )
        warps = result.warp_matrix
        if scale_hw is not None:
            warps = _adjust_warp_for_scale(
                warps, params.motion_type, scale_hw, (h, w)
            )
        acc = acc + warp_accumulate_rgb(
            color.to_unit_f32(frames_j), warps, ok_lane,
            perspective=params.motion_type == MotionType.Homography,
            allow_pallas=cfg is not None,
            pallas_k=cfg[0] if cfg else 7,
            pallas_tile_rows=cfg[1] if cfg else 128,
        )
        all_ok.append(np.asarray(result.ok)[:n_real])
        all_iters.append(np.asarray(result.num_iters)[:n_real])
        all_rho.append(np.asarray(result.rho)[:n_real])
        chunks_done += 1
        if ckpt is not None and (
            chunks_done % max(checkpoint_every, 1) == 0 or cur is None
        ):
            ckpt.save(
                chunks_done,
                acc=np.asarray(acc),
                ok=np.concatenate(all_ok),
                iters=np.concatenate(all_iters),
                rho=np.concatenate(all_rho),
            )

    ok = np.concatenate(all_ok) if all_ok else np.zeros(0, bool)
    if ckpt is not None:
        ckpt.remove()  # completed — the checkpoint has served its job
    stats = None
    if return_stats:
        from ..utils.tracing import PipelineStats

        stats = PipelineStats(
            frames_total=n_total,
            frames_kept=1 + int(ok.sum()),
            frames_dropped=int((~ok).sum()),
            ecc_iterations=np.concatenate(all_iters).tolist()
            if all_iters else [],
            ecc_rho=np.concatenate(all_rho).tolist() if all_rho else [],
        )
    if not ok.all():
        bad = np.nonzero(~ok)[0] + 1
        if on_failure == "raise":
            raise ProcessingError(
                f"findTransformECC failed to converge for frames {bad.tolist()}"
            )
    count = 1 + int(ok.sum()) if not ok.all() else n_total
    out = np.asarray(acc) / count
    return (out, stats) if return_stats else out
