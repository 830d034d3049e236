"""Profiling hooks.

The reference's only tracing is commented-out time.time() brackets
(reference deeplab.py:112-117, estep.py:19-26). Here profiling is
first-class: ``trace_context`` wraps a region in a jax.profiler trace
(viewable in XProf/TensorBoard), and ``StepTimer`` measures steady-state
step latency with proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(logdir: str | None):
    """Capture a jax.profiler trace of the enclosed region (no-op if
    logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing that blocks on device results.

    Usage: call ``tick(result)`` once per step; read ``mean_ms`` /
    ``p50_ms`` over the recorded window (warmup steps excluded).
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._count = 0
        self._last = None

    def tick(self, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    @property
    def mean_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def p50_s(self) -> float:
        if not self._times:
            return 0.0
        s = sorted(self._times)
        return s[len(s) // 2]
