"""Multi-host (DCN) mesh smoke test: two local CPU processes join via
``jax.distributed``, build one global ('data','spatial') mesh, assemble
a global burst from per-process frames and run the sharded ECC
align+stack step (SURVEY.md §7 phase 6 — the reference has no
distributed story at all).

Skips when the environment can't run cross-process CPU collectives
(e.g. no gloo support in the wheel); the single-process mesh path is
covered by tests/test_parallel.py.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from libstacker_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(f"localhost:{port}", num_processes=2,
                           process_id=pid)
    assert jax.device_count() == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from libstacker_tpu.ops import color
    from libstacker_tpu.params import MotionType

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    frames_all = np.stack(
        [np.roll(base, shift=i % 3, axis=1) for i in range(4)]
    )
    local = frames_all[2 * pid : 2 * pid + 2]

    mesh = pmesh.make_global_mesh(data=4, spatial=1)
    frames_g = pmesh.shard_frames_global(local, mesh)
    ref_grey = color.rgb_to_gray_u8(jnp.asarray(base)).astype(jnp.float32)
    with mesh:
        stacked, ok = pmesh.ecc_stack_step(
            frames_g, ref_grey, mesh,
            motion_type=MotionType.Translation, num_iters=3, eps=1e-3,
        )
        stacked.block_until_ready()
    if pid == 0:
        np.save(os.path.join(outdir, "stacked.npy"), np.asarray(stacked))
        np.save(os.path.join(outdir, "ok.npy"), np.asarray(ok))
    """
)


def test_two_process_dcn_stack(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    portno = port.getsockname()[1]
    port.close()

    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(portno), str(pid),
             str(tmp_path)],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU run timed out (no gloo collectives?)")
    if any(p.returncode != 0 for p in procs):
        msg = "\n".join(o[-2000:] for o in outs)
        if any(
            s in msg
            for s in ("UNIMPLEMENTED", "not available", "gloo",
                      "DistributedRuntime")
        ):
            pytest.skip(f"distributed CPU unsupported here: {msg[-300:]}")
        raise AssertionError(f"distributed workers failed:\n{msg}")

    stacked = np.load(tmp_path / "stacked.npy")
    ok = np.load(tmp_path / "ok.npy")
    assert ok.shape == (4,) and ok.all()
    assert stacked.shape == (48, 64, 3)

    # single-process reference on the local 8-device CPU mesh
    import jax
    import jax.numpy as jnp

    from libstacker_tpu.ops import color
    from libstacker_tpu.parallel import mesh as pmesh
    from libstacker_tpu.params import MotionType

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    frames_all = np.stack(
        [np.roll(base, shift=i % 3, axis=1) for i in range(4)]
    )
    mesh = pmesh.make_mesh(jax.devices()[:4], data=4, spatial=1)
    frames_j = pmesh.shard_frames(jnp.asarray(frames_all), mesh)
    ref_grey = color.rgb_to_gray_u8(jnp.asarray(base)).astype(jnp.float32)
    with mesh:
        want, ok1 = pmesh.ecc_stack_step(
            frames_j, ref_grey, mesh,
            motion_type=MotionType.Translation, num_iters=3, eps=1e-3,
        )
    np.testing.assert_allclose(stacked, np.asarray(want), atol=1e-4)
