"""Profiling hooks — the TPU equivalent of the reference's ad-hoc
``time.time()`` stage timing and CUDA max-memory prints (SURVEY.md §5.1).

``profile_trace`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard/XProf); ``StepTimer`` gives chained-latency step timing that
works through async dispatch (see bench.py methodology).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device memory stats where available."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        self.steps += 1
        return dt

    @staticmethod
    def device_memory_mb() -> Optional[float]:
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "bytes_in_use" in stats:
                return stats["bytes_in_use"] / 1e6
        except Exception:
            pass
        return None
