#!/bin/sh
# r4e queue (round 3, session 4).  r4d results: 128x384 43.52 fps
# (worse than the 128x256 default's 47.02 — column DMA amortisation is
# exhausted past 256); BENCH_COARSE OOMed in the EAGER banded resize of
# the 100x4K octave build (fixed: cascaded, jitted, lane-chunked octave
# builds — commit a52971c); the lazy-at-default-tile run was cut off by
# session end.  This queue re-runs the two interrupted A/Bs.
set -x

# 1. Coarse-to-fine octaves at the default tile (quality gate:
#    stages.rho_mean/n_ok must match the direct solve's 0.9979/99).
timeout 1800 env BENCH_COARSE=1 python bench.py
timeout 1800 env BENCH_COARSE=2 python bench.py

# 2. Lazy at the new default tile (won at 128x128 by +1.3 fps; the
#    forward_lite sweep says the Gram carry saves ~4%/iter).
timeout 1800 env LIBSTACKER_ECC_MODE=lazy python bench.py
