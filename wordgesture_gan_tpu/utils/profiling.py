"""First-class throughput counters and profiler hooks.

The reference only wall-clocks epochs (train_gan.py:148-157). Here:
``StepTimer`` context-manages block_until_ready'd timings, ``Throughput``
accumulates gestures/sec/chip (the north-star metric), and
``trace_profile`` wraps ``jax.profiler`` trace capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Accurate device timing: synchronizes on the given arrays."""

    def __init__(self):
        self.times: List[float] = []
        self._start: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._start)
        return False

    def stop(self, *sync_arrays) -> float:
        if sync_arrays:
            jax.block_until_ready(sync_arrays)
        dt = time.perf_counter() - self._start
        self.times.append(dt)
        return dt

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else float("nan")

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")


class Throughput:
    """Accumulates items/sec and items/sec/chip over timed windows."""

    def __init__(self, n_chips: Optional[int] = None):
        self.n_chips = n_chips or jax.device_count()
        self.items = 0
        self.seconds = 0.0

    def update(self, n_items: int, seconds: float) -> None:
        self.items += n_items
        self.seconds += seconds

    @property
    def per_sec(self) -> float:
        return self.items / self.seconds if self.seconds else float("nan")

    @property
    def per_sec_per_chip(self) -> float:
        return self.per_sec / self.n_chips

    def summary(self) -> Dict[str, float]:
        return {
            "items_per_sec": self.per_sec,
            "items_per_sec_per_chip": self.per_sec_per_chip,
            "n_chips": self.n_chips,
        }


@contextlib.contextmanager
def trace_profile(log_dir: Optional[str]):
    """jax.profiler trace capture when a directory is given, no-op otherwise."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
