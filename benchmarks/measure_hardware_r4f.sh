#!/bin/sh
# r4f queue (round 3, session 4).  r4e: coarse-to-fine WINS
# (BENCH_COARSE=1 50.99 fps vs 47.02 direct; rho improves) -> bench
# default flipped to coarse_levels=1.  lazy at the default tile LOSES
# (46.36) -> forward stays.  Remaining levers: the stacking warp's
# tile columns (the fused ECC kernel gained 21% from 256-col tiles;
# the warp window is tile_cols+256 wide, so 256/384 halve/third the
# column-DMA amplification), and attribution of the 119 ms keypoint
# match+RANSAC stage.
set -x

# 1. Canonical headline at the new defaults (coarse=1).
timeout 1800 python bench.py

# 2. Stacking-warp tile-columns A/B on the headline.
timeout 1800 env LIBSTACKER_WARP_TILE_COLS=256 python bench.py
timeout 1800 env LIBSTACKER_WARP_TILE_COLS=384 python bench.py

# 3. Keypoint headline: default then the warp-tile A/B (the warp+stack
#    stage is 112 ms of the 20x4K budget).
timeout 1800 python benchmarks/bench_keypoint.py
timeout 1800 env LIBSTACKER_WARP_TILE_COLS=256 python benchmarks/bench_keypoint.py

# 4. Match/RANSAC sub-stage attribution (119 ms of the keypoint budget).
timeout 1800 python benchmarks/profile_match.py --frames 20
