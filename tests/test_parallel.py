"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8; the analogue of the reference's
CPU-forced tests, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from challenge_tpu.config import Config
from challenge_tpu.data.pipeline import build_banks
from challenge_tpu.models import get_model
from challenge_tpu.parallel import (
    make_fused_train_step, make_mesh, make_sharded_train_step, replicate,
    shard_batch)
from challenge_tpu.train import init_state


def _banks():
    rng = np.random.default_rng(0)
    return build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)])


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8


def test_sharded_train_step_runs_and_matches_single():
    """The 8-way sharded step must produce the same loss as the single-device
    step on the same replicated inputs (psum-of-grads == full-batch grads)."""
    # sgd keeps the update linear in the gradients so the psum-vs-serial
    # reduction-order float noise stays at epsilon scale (adam's rsqrt would
    # amplify it at step 1)
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=8,
                 optimizer='sgd')
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    step, opt = make_sharded_train_step(bundle, mesh)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state = replicate(state, mesh)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 80, 64, 2)).astype('f4'))
    y = jnp.asarray((rng.uniform(size=(8, 2, 3)) > 0.7).astype('f4'))
    batch = shard_batch((x, y), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics['loss']))

    # single-device comparison
    from challenge_tpu.train import make_train_step
    sstep, sopt = make_train_step(bundle)
    sstate = init_state(bundle, jax.random.PRNGKey(0), sopt)
    s_new, s_metrics = sstep(sstate, (x, y), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(s_metrics['loss']), rtol=1e-5)
    # updated params agree (grad psum == full-batch grad)
    a = jax.tree.leaves(new_state.params)[0]
    b = jax.tree.leaves(s_new.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_train_step_multichip():
    """Synthesis + features + train step in ONE XLA program over the mesh."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=8, n_chan=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    fused, opt = make_fused_train_step(bundle, cfg, mesh)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    banks = replicate(_banks(), mesh)
    key = jax.random.PRNGKey(3)
    for i in range(2):
        key, k = jax.random.split(key)
        state, metrics = fused(state, banks, k)
    jax.block_until_ready(state)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2


def test_fused_train_step_pallas_shard_map(monkeypatch):
    """The Pallas synthesis kernel survives under a mesh: shard_map runs one
    kernel per device over its local batch shard (interpret mode on the CPU
    mesh). VERDICT r1 weak #4."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    # bg length 94 >= n_frame 64: pallas mode requires contiguous windows
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=16, n_chan=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    fused, opt = make_fused_train_step(bundle, cfg, mesh, use_pallas=True)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    banks = replicate(_banks(), mesh)
    state, metrics = fused(state, banks, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_sharded_feature_fn_shards_batch_and_varies_per_device():
    """Per-device synthesis folds the mesh position into the key: shards draw
    different mixtures, and the output is sharded on the batch axis."""
    from challenge_tpu.parallel import make_sharded_feature_fn
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=16, n_chan=2)
    mesh = make_mesh(8)
    fn = make_sharded_feature_fn(cfg, mesh, training=False, use_pallas=False)
    banks = replicate(_banks(), mesh)
    x, y = jax.jit(fn)(jax.random.PRNGKey(0), banks)
    assert x.shape[0] == 16
    x = np.asarray(x)
    # per-device shards (2 samples each) must differ from their neighbors
    assert not np.allclose(x[0:2], x[2:4])
    # indivisible batch -> caller must fall back
    cfg_bad = Config(model_type='vad', v=3, n_frame=64, batch_size=12)
    assert make_sharded_feature_fn(cfg_bad, mesh) is None


def test_fused_steps_per_call_scan():
    """steps_per_call>1 runs N optimizer steps in one dispatch."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None,
                                       steps_per_call=3)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state, metrics = fused(state, _banks(), jax.random.PRNGKey(1))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics['loss']))


def test_graft_entry_contract():
    """__graft_entry__.entry() must be jittable; dryrun_multichip must build
    and run an n-device training step."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        '__graft_entry__', '/root/repo/__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out)))
    mod.dryrun_multichip(8)
