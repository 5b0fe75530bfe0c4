"""Profiling and step-time metering (SURVEY.md section 5: the reference has
no tracing at all; this adds jax.profiler hooks + throughput meters)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["profile_trace", "StepTimer"]


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock pairs/sec meter with warmup skip."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.items = 0
        self.start = None

    def step(self, n_items: int = 1):
        self.count += 1
        if self.count == self.warmup:
            self.start = time.perf_counter()
            self.items = 0
        elif self.count > self.warmup:
            self.items += n_items

    @property
    def rate(self) -> float:
        if self.start is None or self.items == 0:
            return 0.0
        return self.items / (time.perf_counter() - self.start)
