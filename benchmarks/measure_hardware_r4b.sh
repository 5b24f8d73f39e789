#!/bin/sh
# Post-followup hardware queue (round 3, session 2).  Decides the
# fused-ECC tile default from END-TO-END numbers (the raw sweep in
# bench_ecc_tile.py says (64,384)/(64,512) are 26-33% faster per
# lane-iteration at fixed k, but wider columns shrink the per-axis
# correctness band, so the ladder may pick a higher k on rotating
# bursts — only the headline can arbitrate), re-smokes the fixed
# super-res interleave at 4K, and re-times the masked/u16 smokes
# warm (the r4 queue timed them against cold compiles).
set -x

# 1. Fused-ECC tile A/B on the real headline (100f 4K, rot +-0.6 deg).
timeout 1800 env LIBSTACKER_ECC_TILE=64x384 python bench.py
timeout 1800 env LIBSTACKER_ECC_TILE=64x512 python bench.py
timeout 1800 env LIBSTACKER_ECC_TILE=64x384 LIBSTACKER_ECC_MODE=lazy python bench.py
timeout 1800 env LIBSTACKER_ECC_TILE=64x512 LIBSTACKER_ECC_MODE=lazy python bench.py

# 1b. forward_lite sweep: the lazy solver's steady-state sweep
#     (with_hessian=False) was never timed on hardware — if it is NOT
#     ~20% cheaper than forward, that explains lazy's solve_s parity
#     with forward in the r4 headline.
timeout 900 env PYTHONPATH=.:${PYTHONPATH} python benchmarks/bench_ecc_tile.py --frames 8 --mode forward_lite

# 1c. Detect sub-stage profile: every r3 A/B knob tied or lost
#     (pooled -18%!), so the path to 50 fps needs the real split of
#     the 0.67 s detect stage.
timeout 1200 env PYTHONPATH=.:${PYTHONPATH} python benchmarks/profile_detect.py --frames 4

# 2. Super-res 4K x2: the lax.pad phase interleave replaces the rank-5
#    transpose that OOMed (25.5 GB lane-padded copy).  Expect it to
#    complete now; also time a warm second call.
timeout 900 env python - <<'PYEOF'
import numpy as np, time
from bench import make_burst
from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_arrays
frames = make_burst(8, 2160, 3840)
p = EccMatchParameters(motion_type=MotionType.Homography, max_count=50,
                       epsilon=1e-4, output_scale=2)
for tag in ("cold", "warm"):
    t0 = time.perf_counter()
    out = ecc_match_arrays(frames, p)
    print(f"super_res 8x4K x2 [{tag}]:",
          round(time.perf_counter()-t0, 2), "s, shape", out.shape)
PYEOF

# 3. Masked fused-vs-XLA, warm (r4 queue charged the fused path all
#    the compiles; run each twice, report the second).
timeout 1200 env python - <<'PYEOF'
import numpy as np, time, os
from bench import make_burst
from libstacker_tpu import EccMatchParameters, MotionType
from libstacker_tpu.models.ecc import ecc_match_arrays
frames = make_burst(8, 2160, 3840)
mask = np.full((2160, 3840), 255, np.uint8)
mask[800:1400, 1200:2600] = 0
p = EccMatchParameters(motion_type=MotionType.Homography, max_count=50,
                       epsilon=1e-4)
times = {}
for tag, env in (("fused", None), ("xla", "1")):
    if env:
        os.environ["LIBSTACKER_DISABLE_PALLAS"] = env
    for i in range(2):
        t0 = time.perf_counter()
        out, stats = ecc_match_arrays(frames, p, return_stats=True,
                                      mask=mask)
        times[f"{tag}{i}"] = round(time.perf_counter() - t0, 2)
print("masked 8x4K warm:", times)
PYEOF

# 4. u16 vs u8, order swapped + warm (r4 ran u16 first = all compiles).
timeout 1200 env python - <<'PYEOF'
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
times = {}
for tag, fr in (("u8", frames8), ("u16", frames16), ("u8w", frames8),
                ("u16w", frames16)):
    t0 = time.perf_counter()
    out, st = ecc_match_arrays(fr, p, return_stats=True)
    times[tag] = round(time.perf_counter() - t0, 2)
print("u16-vs-u8 warm:", times)
PYEOF
