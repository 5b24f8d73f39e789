#!/bin/sh
# Tile/init sweep round 3 (session 3, after r4c).  r4c end-to-end:
# (64,256) 44.76 / (128,256) 47.02 / (64,384) 40.62 / (64,512) 25.70 /
# 128x128 default 37.21 — full 128 rows with 256 cols wins (column DMA
# amortisation without the x-band shrink that escalates the rotated
# lanes); the default flipped to (128,256).  phase_init_rotation LOST
# the headline badly (15.45 fps: the 4K log-polar pass costs 4.0 s and
# its ~1% scale noise kicks lanes out of the k=1 band, solve_s 5.9) —
# stays opt-in for genuinely rotated/scaled content.  Remaining:
# wider columns at 128 rows, coarse-to-fine octaves (iters_mean 4.85
# -> ~2 full-res iterations expected), lazy at the new default tile.
set -x

# 1. Wider columns at full rows.
timeout 1800 env LIBSTACKER_ECC_TILE=128x384 python bench.py

# 2. Coarse-to-fine octaves at the new default tile (quality gate:
#    stages.rho_mean/n_ok must match the direct solve).
timeout 1800 env BENCH_COARSE=1 python bench.py
timeout 1800 env BENCH_COARSE=2 python bench.py

# 3. Lazy at the new default tile (won at 128x128 by +1.3 fps, lost at
#    64x384; the Gram carry saves ~4% per iteration).
timeout 1800 env LIBSTACKER_ECC_MODE=lazy python bench.py
