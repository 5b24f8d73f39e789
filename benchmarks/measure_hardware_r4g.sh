#!/bin/sh
# r4g queue (round 3, session 5).  r4f results: canonical headline
# 50.12 fps (509x) at coarse=1/(128,256); WARP_TILE_COLS=256/384 on
# bench.py OOMed scoped VMEM (fixed: warp/accum/SR kernels now set
# vmem_limit_bytes=100MB like the ECC kernel); keypoint at 256 cols
# LOSES (33.7 vs 42.0 — the wide tile shrinks the k=1 band, warp_k
# escalates to 3).  New this queue: Pallas-path slab sizing (the 4e8
# pixel-iteration budget was XLA-path sized; the fused kernel runs
# ~2.3e9/s, so full-res 4K slabs were ONE iteration and every GN step
# paid a ~100ms tunnel sync round).
set -x

# 1. Attribution of the coarse-to-fine overhead (before judging A/Bs).
timeout 1800 env LIBSTACKER_ECC_PROFILE=1 python bench.py

# 2. Canonical headline with the Pallas slab sizing.
timeout 1800 python bench.py

# 3. Direct solve re-A/B: fewer syncs may close the coarse gap.
timeout 1800 env BENCH_COARSE=0 python bench.py

# 4. Stacking-warp wide-column A/B, now that the VMEM fix lets it run
#    (expect a loss like keypoint if warp_k escalates; confirm + record).
timeout 1800 env LIBSTACKER_WARP_TILE_COLS=256 python bench.py
