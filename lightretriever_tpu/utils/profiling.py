"""Profiling / tracing hooks (SURVEY.md §5: the reference only has QPS prints;
we provide jax.profiler traces + phase timers as first-class utilities)."""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock phase timer with QPS-style logging
    (generalizes the reference's FaissIndex QPS print, faiss_index.py:36-38)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, n_items: Optional[int] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if n_items:
                logger.info("%s: %.4fs (%.1f items/s)", name, dt, n_items / max(dt, 1e-9))

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }


def annotate(name: str):
    """Named-scope annotation for traces (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
