"""Profiling utilities (aux subsystem: the reference only has wall-clock
timing, engine.py:92-105; here we expose the XLA profiler + step timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (view with tensorboard/xprof); no-op when
    logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Blocking per-step wall-clock timing (reference time/step logging)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self):
        return 1000 * sum(self.times) / max(len(self.times), 1)
