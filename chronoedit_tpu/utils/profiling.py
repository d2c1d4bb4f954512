"""Profiling + failure detection utilities.

TPU-native equivalents of the reference observability stack (SURVEY §5.1,
§5.3):

- :func:`profile_trace` — jax.profiler trace context on a step schedule
  (torch.profiler chrome traces, utils/profiling.py:36-85 -> Perfetto).
- :class:`SectionTimer` — per-section wall times (TrainingTimer,
  misc.py:338-392).
- :class:`StepTimeMonitor` — per-step latency statistics with outlier
  flagging; the single-host analogue of StragglerDetectorV2's per-rank
  kernel-time comparison (misc.py:539-620): on a mesh, feed it each host's
  step time and compare via the report.
"""

from __future__ import annotations

import collections
import contextlib
import statistics
import time


@contextlib.contextmanager
def profile_trace(log_dir: str = "profiles", enabled: bool = True):
    """Capture a jax.profiler trace (view with Perfetto/XProf)."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating named-section timer::

        with timer.section("dataloader"): batch = next(it)
        timer.report() -> {"dataloader": {...}}
    """

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


class StepTimeMonitor:
    """Rolling step-time stats; flags stragglers/outliers.

    ``record()`` each step; ``is_outlier`` marks steps slower than
    ``threshold`` x the rolling median; after ``max_consecutive`` consecutive
    outliers, ``should_raise`` turns True (StragglerDetectorV2's
    raise-after-10 behaviour, misc.py:539-620).
    """

    def __init__(self, window: int = 100, threshold: float = 1.5,
                 max_consecutive: int = 10):
        self.window = collections.deque(maxlen=window)
        self.threshold = threshold
        self.max_consecutive = max_consecutive
        self.consecutive = 0

    def record(self, step_time_s: float) -> bool:
        """Returns True if this step is an outlier."""
        median = statistics.median(self.window) if len(self.window) >= 5 else None
        self.window.append(step_time_s)
        if median is None:
            return False
        outlier = step_time_s > self.threshold * median
        self.consecutive = self.consecutive + 1 if outlier else 0
        return outlier

    @property
    def should_raise(self) -> bool:
        return self.consecutive >= self.max_consecutive

    def report(self) -> dict[str, float]:
        if not self.window:
            return {}
        vals = list(self.window)
        return {
            "mean_s": statistics.fmean(vals),
            "median_s": statistics.median(vals),
            "p95_s": sorted(vals)[int(0.95 * (len(vals) - 1))],
            "max_s": max(vals),
        }
