"""Profiling and tracing utilities.

The reference's only observability is wall-clock epoch timing
(expertsim/train/loop.py:59-75). The TPU build adds first-class tracing
(SURVEY.md §5): ``jax.profiler`` traces viewable in Perfetto/TensorBoard,
plus a lightweight step timer that reports steps/sec and showers/sec.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``trace_dir`` (no-op if None)."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("Profiler trace written to %s", trace_dir)


class StepTimer:
    """Steady-state step timing with warmup exclusion (first N steps include
    compilation and are discarded)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._t0: Optional[float] = None
        self._measured = 0

    def tick(self) -> None:
        self._count += 1
        if self._count == self.warmup_steps + 1:
            self._t0 = time.perf_counter()
        if self._count > self.warmup_steps:
            self._measured = self._count - self.warmup_steps

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._measured < 2:
            return float("nan")
        return (self._measured - 1) / (time.perf_counter() - self._t0)

    def samples_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec * batch_size
