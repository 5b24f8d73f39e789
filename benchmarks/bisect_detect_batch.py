"""Bisect the 4K detection batch cliff (r4 VERDICT weak #3 root-cause
work): run benchmarks/repro_detect_batch.py at increasing batch sizes,
each in its OWN subprocess (a device fault must not take down the
driver), and record where the fault starts plus the exact failure text.

Optionally sweeps XLA flag candidates at the first faulting batch to
identify whether a scheduler/allocator behavior is implicated.

Usage (REAL TPU): PYTHONPATH=. python benchmarks/bisect_detect_batch.py
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPRO = os.path.join(HERE, "repro_detect_batch.py")


def run_one(batch, extra_env=None, timeout=1500):
    env = dict(os.environ)
    # APPEND to PYTHONPATH: clobbering it hides the axon TPU plugin
    # site dir (/root/.axon_site) and the backend disappears
    env["PYTHONPATH"] = (
        os.path.join(HERE, "..") + os.pathsep + env.get("PYTHONPATH", "")
    )
    if extra_env:
        env.update(extra_env)
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, REPRO, "--batch", str(batch)],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        dt = time.time() - t0
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-6:]
        return ok, dt, "\n    ".join(tail)
    except subprocess.TimeoutExpired:
        return False, time.time() - t0, "TIMEOUT"


def main():
    batches = [int(b) for b in (
        sys.argv[1].split(",") if len(sys.argv) > 1
        else ["10", "12", "14", "16", "18", "20"]
    )]
    first_bad = None
    for b in batches:
        ok, dt, tail = run_one(b)
        print(f"batch {b}: {'OK' if ok else 'FAULT'} ({dt:.0f}s)",
              flush=True)
        if not ok:
            print(f"    {tail}", flush=True)
            if first_bad is None:
                first_bad = b
            break
    if first_bad is None:
        print("no fault up to", batches[-1])
        return
    # flag sweep at the first faulting batch
    candidates = [
        ("latency_hiding_off",
         {"XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
          + " --xla_tpu_enable_latency_hiding_scheduler=false"}),
        ("scan_detect_off", {"LIBSTACKER_DETECT_SCAN": "0"}),
        ("fast_tree_2stage", {"LIBSTACKER_FAST_TREE": "2stage"}),
        ("fast_tree_noshare", {"LIBSTACKER_FAST_TREE": "noshare"}),
    ]
    for name, env in candidates:
        ok, dt, tail = run_one(first_bad, env)
        print(f"batch {first_bad} + {name}: "
              f"{'OK' if ok else 'FAULT'} ({dt:.0f}s)", flush=True)
        if not ok:
            print(f"    {tail.splitlines()[-1] if tail else ''}",
                  flush=True)


if __name__ == "__main__":
    main()
