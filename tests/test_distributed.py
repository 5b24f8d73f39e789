"""Multi-host (DCN) mesh tests: two local CPU processes join via
``jax.distributed``, build one global ('data','spatial') mesh, assemble
a global burst from per-process frames and run the sharded steps
(SURVEY.md §7 phase 6 — the reference has no distributed story at all).

Three scenarios (r3 VERDICT item 7 — the r3 suite only crossed the
process boundary with translation/mean): translation ECC + mean,
homography ECC + distributed sigma-clip (the clip moments psum across
DCN), and the keypoint path with a genuinely dropped frame (reference
drop semantics, src/lib.rs:240-242, across processes).  Each asserts
parity with the same scenario on the single-process 8-device mesh via
the shared tests/_dcn_scenarios.py definitions.

Skips when the environment can't run cross-process CPU collectives
(e.g. no gloo support in the wheel); the single-process mesh path is
covered by tests/test_parallel.py and test_mesh_public_api.py.
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
    port, pid, outdir, scenario = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from libstacker_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(f"localhost:{port}", num_processes=2,
                           process_id=pid)
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
    import _dcn_scenarios as sc

    frames_all, base = sc.make_burst(scenario)
    n = frames_all.shape[0]
    local = frames_all[pid * n // 2 : (pid + 1) * n // 2]

    mesh = pmesh.make_global_mesh(data=4, spatial=1)
    frames_g = pmesh.shard_frames_global(local, mesh)
    stacked, ok = sc.run_step(scenario, frames_g, base, mesh)
    if pid == 0:
        np.save(os.path.join(outdir, "stacked.npy"), stacked)
        np.save(os.path.join(outdir, "ok.npy"), ok)
    """
)


def _run_two_process(tmp_path, scenario: str):
    port = socket.socket()
    port.bind(("localhost", 0))
    portno = port.getsockname()[1]
    port.close()

    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(portno), str(pid),
             str(tmp_path), scenario],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            # the keypoint scenario's shard_map ORB program can take
            # >5 min to compile per process on a contended 1-core host
            out, _ = p.communicate(timeout=1200)
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
    return (
        np.load(tmp_path / "stacked.npy"), np.load(tmp_path / "ok.npy")
    )


def _single_process_reference(scenario: str):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__))
    import _dcn_scenarios as sc

    from libstacker_tpu.parallel import mesh as pmesh

    frames_all, base = sc.make_burst(scenario)
    mesh = pmesh.make_mesh(jax.devices()[:4], data=4, spatial=1)
    frames_j = pmesh.shard_frames(jnp.asarray(frames_all), mesh)
    return sc.run_step(scenario, frames_j, base, mesh), frames_all


@pytest.mark.parametrize(
    "scenario", ["translation", "homography_sigma", "keypoint_drop"]
)
def test_two_process_dcn_parity(tmp_path, scenario):
    stacked, ok = _run_two_process(tmp_path, scenario)
    (want, ok_want), frames_all = _single_process_reference(scenario)
    n = frames_all.shape[0]
    assert ok.shape == (n,)
    np.testing.assert_array_equal(ok, ok_want)
    if scenario == "keypoint_drop":
        # the flattened frame must be DROPPED on whichever process held
        # it, and nowhere else
        assert not ok[2] and ok[[0, 1, 3]].all()
    else:
        assert ok.all()
    assert stacked.shape == want.shape
    if scenario == "homography_sigma":
        # documented near-exactness of the distributed clip: the psum
        # reduction order can flip samples exactly on the kappa
        # boundary at isolated pixels
        diff = np.abs(stacked - want)
        assert (diff <= 1e-4).mean() > 0.999
        assert diff.max() < 0.05
    else:
        np.testing.assert_allclose(stacked, want, atol=1e-4)
