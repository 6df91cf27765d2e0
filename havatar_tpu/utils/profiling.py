"""Profiling & tracing as a first-class module.

The reference has only wall-clock prints (train_avatar.py:160-166,
fit_video.py:125, tracker.py:1209-1211 — SURVEY.md §5). Here:

* ``StepTimer`` — rolling per-step timing with device-sync points;
* ``trace`` — context manager around ``jax.profiler`` emitting TensorBoard-
  viewable traces (host + TPU timelines, HLO cost view);
* ``annotate`` — named trace spans for the hot phases (plane-gen, ray-march,
  SR) so TPU timelines attribute time to pipeline stages.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import jax


class StepTimer:
    def __init__(self, window: int = 100):
        self.window = window
        self.times: deque = deque(maxlen=window)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Stops timing; blocks on ``result`` first if given (so device work
        is included)."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else 0.0


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
