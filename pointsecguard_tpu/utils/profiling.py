"""Profiling helpers: jax.profiler traces + step timing.

The reference had only ad-hoc ms/batch prints (`RandLANet.py:213-215`);
here a ``--profile`` flag on any driver wraps the hot loop in a
``jax.profiler`` trace whose xplane dump can be opened in TensorBoard /
xprof (SURVEY.md §5 recommendation).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def maybe_trace(log_dir: str | None):
    """Trace the enclosed block to ``log_dir`` if it is set."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Rolling step timer — logs device-synchronized ms/step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = time.perf_counter()

    def tick(self) -> float | None:
        now = time.perf_counter()
        self._times.append(now - self._last)
        self._last = now
        if len(self._times) >= self.window:
            avg = sum(self._times) / len(self._times)
            self._times.clear()
            return avg * 1000.0
        return None
