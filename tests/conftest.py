"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding paths
are exercised without TPU hardware (analogue of the reference forcing
CUDA_VISIBLE_DEVICES=-1 in every test, e.g. transforms_test.py:112).

The container's sitecustomize force-registers the axon TPU backend and sets
JAX_PLATFORMS=axon, so plain env vars are not enough — the jax config has to
be switched to CPU explicitly before any backend is initialized.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# keep TF (used only for golden parity tests) quiet and off any accelerator
os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running end-to-end test')
