"""Tracing/profiling hooks — the observability layer the reference lacks
(SURVEY.md §5.1: wall-clock prints only).

* :class:`StepTimer` — cheap steady-state step timing with warmup discard;
* :func:`trace` — context manager around ``jax.profiler`` writing a TensorBoard
  trace (device + host) to a directory;
* :func:`annotate` — named TraceAnnotation for host-side phases.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

__all__ = ["StepTimer", "trace", "annotate"]


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t: Optional[float] = None
        self._n = 0

    def tic(self):
        self._t = time.perf_counter()

    def toc(self):
        if self._t is None:
            return
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            self._times.append(dt)
        self._t = None

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def images_per_sec(self, batch: int) -> float:
        return batch / self.mean if self.mean else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block with jax.profiler (no-op if log_dir falsy)."""
    if not log_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax.profiler

    return jax.profiler.TraceAnnotation(name)
