"""Shared scenario definitions for the multi-host (DCN) tests: the
two-process workers and the single-process parity reference run the
SAME burst construction and the SAME sharded step through this module,
so any divergence a test sees is a cross-process effect, not a content
or config drift.  Imported by tests/test_distributed.py and by the
worker subprocesses it spawns (sys.path-inserted; not a pytest file).
"""

import numpy as np

H, W = 48, 64
KH, KW = 96, 160
N_FRAMES = {"translation": 4, "homography_sigma": 8, "keypoint_drop": 4}


def make_burst(scenario: str):
    """-> (frames_all [N,h,w,3] u8, base [h,w,3] u8).  Deterministic."""
    rng = np.random.default_rng(0)
    n = N_FRAMES[scenario]
    if scenario == "keypoint_drop":
        # block texture (FAST corners at every block boundary, 3+
        # pyramid levels); frame 2 is flattened -> <5 matches -> the
        # reference's drop semantics (src/lib.rs:240-242) must cross
        # the process boundary intact
        small = rng.integers(0, 256, (KH // 8, KW // 8), np.uint8)
        tex = small.repeat(8, axis=0).repeat(8, axis=1)
        base = np.stack([tex] * 3, -1)
        frames = np.stack(
            [np.roll(base, shift=i % 3, axis=1) for i in range(n)]
        )
        frames[2] = 128  # flat: no keypoints
        return frames, base
    base = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
    frames = np.stack(
        [np.roll(base, shift=i % 3, axis=1) for i in range(n)]
    )
    return frames, base


def run_step(scenario: str, frames_g, base, mesh):
    """Run the scenario's sharded step -> (stacked np[H,W,3], ok np[N]).
    ``frames_g``: the (globally or locally) sharded burst;  ``base``:
    the reference frame (host numpy)."""
    import jax
    import jax.numpy as jnp

    from libstacker_tpu.ops import color
    from libstacker_tpu.parallel import mesh as pmesh
    from libstacker_tpu.params import MotionType

    with mesh:
        if scenario == "translation":
            stacked, ok = pmesh.ecc_stack_step(
                frames_g,
                color.rgb_to_gray_u8(jnp.asarray(base)).astype(jnp.float32),
                mesh,
                motion_type=MotionType.Translation, num_iters=3, eps=1e-3,
            )
        elif scenario == "homography_sigma":
            # homography motion + the distributed kappa-sigma clip: the
            # per-pixel moment accumulators psum across the process
            # boundary (kappa low enough to act at n=8)
            stacked, ok = pmesh.ecc_stack_step(
                frames_g,
                color.rgb_to_gray_u8(jnp.asarray(base)).astype(jnp.float32),
                mesh,
                motion_type=MotionType.Homography, num_iters=3, eps=1e-3,
                stacking="sigma_clip", sigma_kappa=1.5, sigma_iters=1,
            )
        elif scenario == "keypoint_drop":
            from libstacker_tpu.models import keypoint as kp_models

            feats0 = kp_models.detect_features_chunked(
                jnp.asarray(base)[None]
            )
            ref_feats = jax.tree.map(lambda x: x[0], feats0)
            stacked, ok = pmesh.keypoint_stack_step(
                frames_g, ref_feats, mesh, seed=1
            )
        else:
            raise ValueError(scenario)
        stacked.block_until_ready()
    return np.asarray(stacked), np.asarray(ok)
