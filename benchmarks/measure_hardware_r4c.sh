#!/bin/sh
# Follow-up queue (round 3, session 3).  The r4b end-to-end tile A/B
# put forward@(64,384) at 40.62 fps (vs 37.21 default) but (64,512)
# collapsed to 25.7 — the x-band shrink escalates the rotated lanes.
# (64,256)/(128,256) cost ~the same per lane-iteration (3.53/3.54 vs
# 3.17) with half the band shrink, so they may win end-to-end; the
# rotation-aware phase init may cut iteration counts on the +-0.6 deg
# headline content.  Steps 4-5 re-run the two r4b smokes that died on
# a wedged worker (FAILED_PRECONDITION right after the step-2 crash).
set -x

# 1. Tile A/B, wider-band candidates.
timeout 1800 env LIBSTACKER_ECC_TILE=64x256 python bench.py
timeout 1800 env LIBSTACKER_ECC_TILE=128x256 python bench.py

# 2. Rotation-aware phase init on the best tile so far.
timeout 1800 env LIBSTACKER_ECC_TILE=64x384 BENCH_PHASE_ROT=1 python bench.py

# 3. Combination check: rotation init widens no band but fewer
#    iterations may change the escalation picture at 128x128 too.
timeout 1800 env BENCH_PHASE_ROT=1 python bench.py

# 4. Re-run: super-res 8x4K x2 smoke (died at the first slab fetch on
#    a worker still wedged from the r4b step-2 crash).
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

# 5. Re-run: masked fused-vs-XLA warm.
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
