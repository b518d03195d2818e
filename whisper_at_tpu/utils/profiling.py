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


class StageProf:
    """Env-gated per-stage wall+CPU accumulator (the streaming host-work
    profiler's pattern, reusable): ``prof = StageProf("ENV_VAR")``, then
    ``with prof("stage"):`` around each hot-path stage. Disabled (a plain
    nullcontext, zero overhead) unless the env var is "1" at construction.
    ``snapshot()`` returns {stage: {wall_ms, cpu_ms, count, wall_us_each}}.
    """

    def __init__(self, env_var: str):
        import os

        self.enabled = os.environ.get(env_var) == "1"
        self._acc: dict = {}  # name -> [wall_s, cpu_s, count]

    @contextlib.contextmanager
    def _cm(self, name):
        w0 = time.perf_counter()
        c0 = time.thread_time()
        try:
            yield
        finally:
            rec = self._acc.setdefault(name, [0.0, 0.0, 0])
            rec[0] += time.perf_counter() - w0
            rec[1] += time.thread_time() - c0
            rec[2] += 1

    def __call__(self, name):
        return self._cm(name) if self.enabled else contextlib.nullcontext()

    def add(self, name, wall_s: float, cpu_s: float = 0.0):
        """Record an externally-timed interval (e.g. a gap between calls)."""
        if self.enabled:
            rec = self._acc.setdefault(name, [0.0, 0.0, 0])
            rec[0] += wall_s
            rec[1] += cpu_s
            rec[2] += 1

    def snapshot(self, reset: bool = True) -> dict:
        out = {
            k: dict(wall_ms=round(v[0] * 1e3, 1),
                    cpu_ms=round(v[1] * 1e3, 1), count=v[2],
                    wall_us_each=round(v[0] / max(v[2], 1) * 1e6, 1))
            for k, v in self._acc.items()
        }
        if reset:
            self._acc.clear()
        return out
