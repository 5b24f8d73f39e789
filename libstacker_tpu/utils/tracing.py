"""Tracing / profiling utilities (SURVEY.md §5).

The reference has no tracing in the library; its example hand-times
phases with ``std::time::Instant`` (examples/main.rs:36-133).  Here we
provide:

- :class:`PhaseTimer` — wall-time phase timers with a printable report
  (device work is fenced with ``block_until_ready`` so timings are real);
- :func:`trace` — context manager around ``jax.profiler.trace`` for
  XLA-level traces viewable in TensorBoard/Perfetto;
- :class:`PipelineStats` — structured per-run observability record
  (frames kept/dropped, ECC iterations, match counts) returned by the
  pipelines alongside the stacked image when requested.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List, Optional


class PhaseTimer:
    """Collects named wall-time phases.

    >>> t = PhaseTimer()
    >>> with t.phase("load"):
    ...     pass
    >>> _ = t.report()
    """

    def __init__(self):
        self.durations: Dict[str, float] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.durations:
                self._order.append(name)
                self.durations[name] = 0.0
            self.durations[name] += dt

    def report(self) -> str:
        lines = [f"{name:>24s}: {self.durations[name]*1e3:10.2f} ms"
                 for name in self._order]
        total = sum(self.durations.values())
        lines.append(f"{'total':>24s}: {total*1e3:10.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """XLA profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@dataclasses.dataclass
class PipelineStats:
    """Structured per-run observability (SURVEY.md §5 metrics/logging)."""

    frames_total: int = 0
    frames_kept: int = 0
    frames_dropped: int = 0
    ecc_iterations: Optional[List[int]] = None
    ecc_rho: Optional[List[float]] = None
    match_counts: Optional[List[int]] = None
    inlier_counts: Optional[List[int]] = None
    phase_ms: Optional[Dict[str, float]] = None
    #: stacking="sigma_clip" only: fraction of warped samples rejected
    #: by the kappa-sigma clip (0.0 on outlier-free bursts).
    clipped_sample_frac: Optional[float] = None

    def summary(self) -> str:
        parts = [
            f"frames {self.frames_kept}/{self.frames_total} kept "
            f"({self.frames_dropped} dropped)"
        ]
        if self.ecc_iterations is not None:
            parts.append(f"ecc iters {self.ecc_iterations}")
        if self.match_counts is not None:
            parts.append(f"matches {self.match_counts}")
        if self.inlier_counts is not None:
            parts.append(f"inliers {self.inlier_counts}")
        return "; ".join(parts)
