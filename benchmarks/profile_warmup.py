"""Per-program attribution of the headline warmup (r4 VERDICT item 2).

Registers jax.monitoring listeners with ``fun_name`` capture and runs
ONE cold headline pass (100x4K by default — override with
BENCH_FRAMES/BENCH_H/BENCH_W), then prints every compiled program's
trace / lower / backend-compile seconds sorted by total cost.  This is
the evidence base for pruning program variants: the r5 measurement
showed warmup is ~100% host-side program construction
(residual_dispatch_s = 0), not tunnel RTT.

Run (REAL TPU): PYTHONPATH=. python benchmarks/profile_warmup.py
"""

import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from libstacker_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    per = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    KEY = {
        "/jax/core/compile/jaxpr_trace_duration": 0,
        "/jax/core/compile/jaxpr_to_mlir_module_duration": 1,
        "/jax/core/compile/backend_compile_duration": 2,
    }

    def _dur(name, dur, **kw):
        i = KEY.get(name)
        if i is None:
            return
        fn = kw.get("fun_name", "?")
        per[fn][i] += dur
        if i == 2:
            per[fn][3] += 1

    jax.monitoring.register_event_duration_secs_listener(_dur)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("BENCH_SECONDARY", "0")
    os.environ.setdefault("BENCH_SKIP_PARITY", "1")
    import bench

    n, h, w = bench.N_FRAMES, bench.H, bench.W
    print(f"devices: {jax.devices()}", file=sys.stderr)
    frames = bench.make_burst(n, h, w)
    frames_j = jnp.asarray(frames)
    frames_j.block_until_ready()

    from libstacker_tpu.ops import color, ecc as ecc_ops, warp_batch
    from libstacker_tpu.ops import phasecorr
    from libstacker_tpu.params import MotionType

    t0 = time.perf_counter()
    grey = jax.jit(
        lambda f: color.rgb_to_gray_u8(f).astype(jnp.float32)
    )(frames_j)
    init = phasecorr.phase_init_warps(
        grey[1:], grey[0], motion_type=MotionType.Homography
    )
    res = ecc_ops.find_transform_ecc_batched(
        grey[1:], grey[0], motion_type=MotionType.Homography,
        num_iters=50, eps=1e-4, gauss_filt_size=5, coarse_levels=1,
        warp_init=init,
    )
    acc = color.u8_to_f32(frames_j[0]).astype(jnp.float32)
    acc = acc + warp_batch.warp_accumulate_rgb(
        frames_j[1:], res.warp_matrix, res.ok, perspective=True,
        allow_pallas=True, pallas_k=1,
    )
    _ = float(acc[0, 0, 0])
    warm = time.perf_counter() - t0
    print(f"cold headline pass: {warm:.1f}s over {len(per)} programs\n")
    rows = sorted(per.items(), key=lambda kv: -sum(kv[1][:3]))
    print(f"{'program':46s} {'trace':>7s} {'lower':>7s} "
          f"{'compile':>8s} {'n':>3s}")
    tt = tl = tc = 0.0
    for fn, (tr, lo, co, nn) in rows:
        tt += tr
        tl += lo
        tc += co
        if tr + lo + co > 0.05:
            print(f"{fn[:46]:46s} {tr:7.2f} {lo:7.2f} {co:8.2f} {nn:3d}")
    print(f"{'TOTAL':46s} {tt:7.2f} {tl:7.2f} {tc:8.2f}")


if __name__ == "__main__":
    main()
