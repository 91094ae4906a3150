"""Profiling & latency instrumentation.

The reference's only perf hooks are a line-profiler decorator and a timeit
__main__ (SURVEY §5).  Here latency tracking is first-class: a cheap
per-step tracker with percentile reporting (controller.step p50/p99 is the
framework's north-star metric) plus a context manager around
``jax.profiler.trace`` for full XLA traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import numpy as np


class LatencyTracker:
    """Rolling per-step latency statistics."""

    def __init__(self, capacity: int = 10000):
        self.capacity = int(capacity)
        # deque(maxlen): O(1) eviction — a full list's pop(0) would shift
        # 10k entries inside the very hot path being measured.
        self._samples = deque(maxlen=self.capacity)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(time.perf_counter() - t0)

    def record(self, seconds: float) -> None:
        self._samples.append(seconds)

    def __len__(self) -> int:
        return len(self._samples)

    def percentiles(self) -> Dict[str, float]:
        if not self._samples:
            return {}
        ms = np.asarray(self._samples) * 1e3
        return {
            "count": float(len(ms)),
            "p50_ms": float(np.percentile(ms, 50)),
            "p90_ms": float(np.percentile(ms, 90)),
            "p99_ms": float(np.percentile(ms, 99)),
            "max_ms": float(np.max(ms)),
            "mean_ms": float(np.mean(ms)),
        }

    def report(self) -> str:
        p = self.percentiles()
        if not p:
            return "no latency samples recorded"
        return (
            f"controller.step latency over {int(p['count'])} steps: "
            f"p50={p['p50_ms']:.3f}ms p90={p['p90_ms']:.3f}ms "
            f"p99={p['p99_ms']:.3f}ms max={p['max_ms']:.3f}ms"
        )

    def reset(self) -> None:
        self._samples.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (open in TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
