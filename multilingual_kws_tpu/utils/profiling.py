"""Tracing / profiling hooks.

The reference has no profiling beyond datetime bracketing around jobs
(SURVEY.md section 5: batch_streaming_analysis.py:324-336). Here tracing is
first-class:

- `phase(name)` — nested wall-clock phase timers with a report
- `trace(dir)` — jax.profiler trace capture (view in TensorBoard/Perfetto)
- `annotate(name)` — jax.profiler TraceAnnotation for device timelines
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import jax


class PhaseTimer:
    """Accumulating nested phase timers.

    Usage:
        timers = PhaseTimer()
        with timers.phase("train"):
            with timers.phase("train/step"):
                ...
        print(timers.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack: List[str] = []

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            with jax.profiler.TraceAnnotation(name):
                yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                              total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<34} {t:8.3f} {n:7d} {1000 * t / n:9.2f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k]}
            for k in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace (XLA device + host timeline)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Annotation context manager for device timelines."""
    return jax.profiler.TraceAnnotation(name)


_GLOBAL = PhaseTimer()


def global_timer() -> PhaseTimer:
    return _GLOBAL
