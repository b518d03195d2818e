"""Profiling and tracing hooks.

The reference's observability is print-based wall-time meters
(utilities/util.py:238-253, traintest.py:117-128). Here the same meters are
available (train/loop.py AverageMeter) plus first-class device tracing via
jax.profiler — traces open in TensorBoard / Perfetto.
"""

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timer with device-sync option."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times = []
        self._start: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        self.times.append(time.perf_counter() - self._start)

    @property
    def avg(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def best(self) -> float:
        return min(self.times) if self.times else 0.0
