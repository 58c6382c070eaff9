"""Tracing / profiling helpers (SURVEY §5.1: the reference's only
observability is a TensorBoard callback — sj_train.py:494; the TPU-native
equivalents are jax.profiler traces plus step timing).

Usage:
    with trace('/tmp/tb'):              # open in TensorBoard's profile tab
        state, m = train_step(...)

    timer = StepTimer()
    for batch in pipeline:
        with timer:
            state, m = train_step(state, batch, key)
    print(timer.summary())
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
    """Wall-clock step timer with device synchronization on exit."""

    def __init__(self, sync=None):
        self.times: List[float] = []
        self._sync = sync
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
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
