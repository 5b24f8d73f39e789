#!/bin/sh
# Hardware measurement sequence for the round-3 features that were
# built and CPU-verified while the TPU tunnel was down (r3 final
# session; see ROADMAP.md).  Run from the repo root on a live chip.
# Each step is bounded; a wedged Mosaic compile can hang the tunnel
# (CLAUDE.md) — if a step times out, kill the python client and wait
# for the worker before continuing.
set -x

# 1. Smoke: all kernels (incl. the REORDERED forward moment layout and
#    both with_hessian variants) compile + parity-check on Mosaic.
timeout 600 env BENCH_FRAMES=8 python bench.py || exit 1

# 2. Lazy-Hessian solver: expect ~20% cheaper solve stage, same stack.
timeout 600 env BENCH_FRAMES=8 LIBSTACKER_ECC_MODE=lazy python bench.py

# 3. IC solver: expect rescue-dominated on this synthetic bench
#    (documented bias) — recorded for completeness.
timeout 600 env BENCH_FRAMES=8 LIBSTACKER_ECC_MODE=ic python bench.py

# 4. Fused-kernel tile sweep (forward + IC variants).
timeout 900 env PYTHONPATH=.:${PYTHONPATH} python benchmarks/bench_ecc_tile.py --frames 8
timeout 900 env PYTHONPATH=.:${PYTHONPATH} python benchmarks/bench_ecc_tile.py --frames 8 --mode ic
timeout 900 env PYTHONPATH=.:${PYTHONPATH} python benchmarks/bench_ecc_tile.py --frames 8 --mode ic_hessian

# 5. Full headline, forward vs lazy (pick the default from these).
timeout 1800 python bench.py
timeout 1800 env LIBSTACKER_ECC_MODE=lazy python bench.py

# 6. Keypoint headline (tile-shrink dispatch engages only on large
#    rotations; standard burst should be unchanged).
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} python benchmarks/bench_keypoint.py

# 7. Keypoint A/B knobs: 2stage FAST arc tree (expect fast_detect
#    7.2 -> ~5 ms/frame at 4K if the tree intermediates are the
#    traffic) and pooled top-k (lossless 4x reduction of the
#    approx_max_k scans, ~2 ms/frame estimated).
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} LIBSTACKER_FAST_TREE=2stage python benchmarks/bench_keypoint.py
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} LIBSTACKER_TOPK=pooled python benchmarks/bench_keypoint.py
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} LIBSTACKER_FAST_TREE=2stage LIBSTACKER_TOPK=pooled python benchmarks/bench_keypoint.py
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} LIBSTACKER_FAST_TREE=noshare python benchmarks/bench_keypoint.py
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} LIBSTACKER_FAST_TREE=noshare LIBSTACKER_TOPK=pooled python benchmarks/bench_keypoint.py

# 8. sigma_clip robust stacking TPU smoke (kernels are the same tiled
#    warp; this just exercises the moment sweeps + clip on Mosaic).
timeout 900 env BENCH_FRAMES=8 python - <<'PYEOF'
import numpy as np, time, jax.numpy as jnp
from bench import make_burst
from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_arrays
frames = make_burst(8, 2160, 3840)
p = EccMatchParameters(motion_type=MotionType.Homography, max_count=50,
                       epsilon=1e-4, stacking="sigma_clip", sigma_iters=1)
t0 = time.perf_counter()
out, stats = ecc_match_arrays(frames, p, return_stats=True)
print("sigma_clip 8x4K:", round(time.perf_counter()-t0, 2), "s,",
      "clipped", stats.clipped_sample_frac)
PYEOF

# 9. super-resolution stack TPU smoke: 1080p first (Mosaic-compiles the
#    phase-decomposed nearest-tap kernel, ops/sr_pallas — solved warps
#    in-band dispatch to it automatically), then 4K x2 to time the
#    kernel path at full scale.
timeout 900 env python - <<'PYEOF'
import numpy as np, time
from bench import make_burst
from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_arrays
for h, w in ((1080, 1920), (2160, 3840)):
    frames = make_burst(8, h, w)
    p = EccMatchParameters(motion_type=MotionType.Homography, max_count=50,
                           epsilon=1e-4, output_scale=2)
    t0 = time.perf_counter()
    out = ecc_match_arrays(frames, p)
    print(f"super_res 8x{h}p x2:", round(time.perf_counter()-t0, 2), "s,",
          "shape", out.shape)
PYEOF

# 10. masked-ECC fused kernel smoke: the 4-plane (image,gx,gy,mask)
#     variant must Mosaic-compile and match the XLA masked path on
#     hardware (interpret-mode parity already gated in
#     tests/test_ecc_mask.py).
timeout 900 env python - <<'PYEOF'
import numpy as np, time, jax.numpy as jnp
from bench import make_burst
from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_arrays
frames = make_burst(8, 2160, 3840)
mask = np.full((2160, 3840), 255, np.uint8)
mask[800:1400, 1200:2600] = 0
p = EccMatchParameters(motion_type=MotionType.Homography, max_count=50,
                       epsilon=1e-4)
t0 = time.perf_counter()
out, stats = ecc_match_arrays(frames, p, return_stats=True, mask=mask)
t_kernel = time.perf_counter() - t0
import os
os.environ["LIBSTACKER_DISABLE_PALLAS"] = "1"
t0 = time.perf_counter()
out_x, stats_x = ecc_match_arrays(frames, p, return_stats=True, mask=mask)
t_xla = time.perf_counter() - t0
d = float(np.abs(np.asarray(out) - np.asarray(out_x)).max())
print(f"masked 8x4K: fused {t_kernel:.2f}s vs XLA {t_xla:.2f}s, "
      f"stack maxdiff {d:.2e}, rho {stats.ecc_rho}")
PYEOF

# 11. 16-bit burst smoke: same kernels (alignment high-byte, stacking
#     f32), but the u16 H2D upload is 2x the bytes — time it and check
#     parity of the solve with the 8-bit run.
timeout 900 env python - <<'PYEOF'
import numpy as np, time
from bench import make_burst
from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_arrays
frames8 = make_burst(8, 2160, 3840)
rng = np.random.default_rng(0)
frames16 = (frames8.astype(np.uint16) << 8) + rng.integers(
    0, 256, frames8.shape).astype(np.uint16)
p = EccMatchParameters(motion_type=MotionType.Homography, max_count=50,
                       epsilon=1e-4)
t0 = time.perf_counter()
out16, st16 = ecc_match_arrays(frames16, p, return_stats=True)
t16 = time.perf_counter() - t0
t0 = time.perf_counter()
out8, st8 = ecc_match_arrays(frames8, p, return_stats=True)
t8 = time.perf_counter() - t0
print(f"u16 8x4K: {t16:.2f}s vs u8 {t8:.2f}s; iters equal:",
      st16.ecc_iterations == st8.ecc_iterations,
      "stack maxdiff", float(np.abs(np.asarray(out16) -
                                    np.asarray(out8)).max()))
PYEOF
