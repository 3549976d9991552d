"""Profiling and step-timing instrumentation.

The reference has no tracing/profiling at all — only elapsed-time prints
(solver.py:133,185-187; SURVEY.md §5.1). Here:

- :func:`profile_trace` wraps a region in a ``jax.profiler`` trace whose
  output loads in TensorBoard/XProf (op-level TPU timeline);
- :class:`StepTimer` keeps an online EMA of step latency and throughput
  for the training log without host synchronization (it times dispatch
  to dispatch; a periodic ``block_until_ready`` sync point is built into
  the solver's logging cadence).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Trace the enclosed region with jax.profiler if log_dir is set."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer: call .tick() once per training dispatch.

    ``tick(k)`` credits k steps to the elapsed interval (multi-step
    dispatches): the EMA tracks per-step latency either way.
    """

    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.avg: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, steps: int = 1) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) / max(steps, 1)
            self.avg = (
                dt if self.avg is None
                else self.ema * self.avg + (1 - self.ema) * dt
            )
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.avg if self.avg else float("nan")
