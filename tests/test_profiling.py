"""Profiling utility tests (SURVEY §5.1 aux subsystem)."""

import jax.numpy as jnp

from challenge_tpu.utils.profiling import StepTimer, trace


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        with t:
            _ = jnp.ones((8, 8)).sum().block_until_ready()
    s = t.summary()
    assert s['steps'] == 5
    assert s['mean_ms'] >= 0 and s['p95_ms'] >= s['p50_ms'] * 0.5


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        _ = jnp.arange(16.0).sum().block_until_ready()
    # a plugins/profile directory with at least one capture should exist
    found = list(tmp_path.rglob('*'))
    assert found, 'profiler wrote nothing'
