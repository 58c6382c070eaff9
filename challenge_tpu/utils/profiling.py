"""Tracing / profiling helpers (SURVEY §5.1: the reference's only
observability is a TensorBoard callback — sj_train.py:494; the TPU-native
equivalents are jax.profiler traces plus step timing).

Usage:
    with trace('/tmp/tb'):              # open in TensorBoard's profile tab
        state, m = train_step(...)

    timer = StepTimer()
    for batch in pipeline:
        with timer:
            state, m = timer.sync(train_step(state, batch, key))
    print(timer.summary())

(``timer.sync(...)`` registers the step's outputs so the timer can block
on THEM at block exit — JAX dispatch is asynchronous, so without it a
"step time" is really dispatch latency, the exact eager-timing pitfall
NOTES.md's measurement methodology warns about. For cross-dispatch
throughput numbers use the lax.scan-of-N-steps methodology instead.)
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, host_trace: bool = False):
    """jax.profiler trace context: writes a TensorBoard profile to
    ``log_dir``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=host_trace)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling server for `tensorboard --logdir` capture."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Wall-clock step timer with device synchronization on exit.

    The with-block must register the step's outputs via :meth:`sync` so
    the exit can ``block_until_ready`` on them; otherwise (JAX dispatches
    asynchronously) the recorded time is only host dispatch latency."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._pending = None

    def sync(self, outputs):
        """Register this step's outputs to synchronize on; returns them
        unchanged (``state, m = timer.sync(step(...))``)."""
        self._pending = outputs
        return outputs

    def __enter__(self):
        self._pending = None
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if exc[0] is None and self._pending is not None:
            jax.block_until_ready(self._pending)
        self._pending = None
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, skip_warmup: int = 1) -> dict:
        ts = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            'steps': len(self.times),
            'mean_ms': float(ts.mean() * 1e3),
            'p50_ms': float(np.percentile(ts, 50) * 1e3),
            'p95_ms': float(np.percentile(ts, 95) * 1e3),
        }
