"""Step-time metering (SURVEY.md section 5: the reference has no
profiling at all; device traces are captured by the driver's
``profile_dir`` hook via jax.profiler directly)."""

from __future__ import annotations

import time

__all__ = ["StepTimer"]


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
