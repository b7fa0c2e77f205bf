"""Profiling / tracing helpers.

The reference's only instrumentation is detectron2 engine hooks and tqdm
(SURVEY §5 "Tracing"). TPU-native equivalents:
- ``trace(logdir)``: jax.profiler trace context (TensorBoard-compatible,
  captures XLA HLO + TPU hardware counters),
- ``PhaseTimer``: wall-clock per-phase accounting with device sync,
- ``annotate``: named TraceAnnotation for kernels inside a jit region.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """with timer.phase("denoise"): ... — blocks on device completion so the
    recorded wall time is the true device time."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, *, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {n}x, {t / n:.4f}s avg")
        return "\n".join(lines)
