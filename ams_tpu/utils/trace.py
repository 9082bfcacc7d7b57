"""Tracing and per-phase timing (SURVEY.md §5.1).

The reference sprinkles wall-clock prints (per-round training duration
run.py:311-313, per-iteration loss+latency SemanticNetwork.py:261, ffmpeg
encode time, ETF estimates).  Here the same spans are structured: a
``PhaseTimer`` registry records named spans with counts/totals, and
``profile_trace`` wraps a block in the JAX profiler (view with
TensorBoard/xprof) when a trace directory is given.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Named wall-clock span accumulator."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def summary(self) -> str:
        lines = ["%-28s %8s %10s %10s" % ("phase", "count", "total_s",
                                          "mean_ms")]
        for name in sorted(self.totals):
            n = self.counts[name]
            lines.append("%-28s %8d %10.2f %10.1f"
                         % (name, n, self.totals[name],
                            1000 * self.totals[name] / max(n, 1)))
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
        self.last.clear()


GLOBAL_TIMER = PhaseTimer()


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """JAX profiler trace context; no-op when trace_dir is None."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in profiler timelines."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
