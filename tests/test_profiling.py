"""Profiling utility tests (SURVEY §5.1 aux subsystem)."""

import jax.numpy as jnp

from challenge_tpu.utils.profiling import StepTimer, trace


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        with t:
            # register the step's outputs: exit blocks on THEM, so the
            # recorded time covers device execution, not just dispatch
            _ = t.sync(jnp.ones((8, 8)).sum())
    s = t.summary()
    assert s['steps'] == 5
    assert s['mean_ms'] >= 0 and s['p95_ms'] >= s['p50_ms'] * 0.5


def test_step_timer_syncs_on_registered_outputs():
    """The exit must block on the registered outputs — a sleep inside the
    computation shows up in the recorded time (dispatch alone would not)."""
    import time

    import jax

    def slow(x):
        jax.debug.callback(lambda: time.sleep(0.2))
        return x + 1

    t = StepTimer()
    with t:
        t.sync(jax.jit(slow)(jnp.ones((4,))))
    assert t.times[0] >= 0.15, t.times


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        _ = jnp.arange(16.0).sum().block_until_ready()
    # at least one capture FILE must exist (directories alone would mean
    # the profiler wrote only the log-dir skeleton with no capture)
    found = [p for p in tmp_path.rglob('*') if p.is_file()]
    assert found, 'profiler wrote no capture files'
