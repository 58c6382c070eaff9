"""TTA predict, kernel regularizer, and full-train-state checkpoint tests
(reference: utils.py:100-134; resume is a TPU-native addition, SURVEY §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from challenge_tpu.config import Config
from challenge_tpu.models import get_model
from challenge_tpu.train import init_state, make_train_step
from challenge_tpu.train.regularizers import apply_kernel_regularizer, l1_l2
from challenge_tpu.utils import predict


def test_predict_vad_gating():
    def apply_fn(x):
        return jnp.ones(x.shape[:-1] + (60,))
    out = predict(apply_fn, jnp.zeros((2, 4, 3)), vad=True)
    assert out.shape == (2, 4, 30)
    np.testing.assert_allclose(np.asarray(out),
                               1.0 * jax.nn.sigmoid(1.0), rtol=1e-6)


def test_predict_reverse_and_add_identity_for_symmetric_fn():
    # channel-reversal-invariant fn with degree-symmetric output
    def apply_fn(x):
        return jnp.tile(jnp.mean(x, axis=-1, keepdims=True), (1, 1, 30))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 2))
    base = predict(apply_fn, x)
    tta = predict(apply_fn, x, reverse_and_add=True)
    np.testing.assert_allclose(np.asarray(tta), np.asarray(base), rtol=1e-5)


def test_predict_reverse_flips_degree_blocks():
    # fn returning a fixed ramp: TTA must average ramp with per-block flip
    ramp = jnp.arange(30, dtype=jnp.float32)[None, None, :]

    def apply_fn(x):
        return jnp.broadcast_to(ramp, x.shape[:-1] + (30,))
    x = jnp.zeros((1, 2, 2))
    out = predict(apply_fn, x, reverse_and_add=True)
    blocks = np.arange(30).reshape(3, 10)
    expected = (blocks + blocks[:, ::-1]) / 2
    np.testing.assert_allclose(np.asarray(out)[0, 0],
                               expected.reshape(-1), rtol=1e-6)


def test_l1_l2_penalty_counts_only_kernels():
    params = {'Dense_0': {'kernel': jnp.ones((2, 2)), 'bias': jnp.ones((2,))},
              'BatchNorm_0': {'scale': jnp.ones((2,))}}
    pen = l1_l2(l1=0.5, l2=0.25)(params)
    # only the 2x2 kernel: 0.5*4 + 0.25*4 = 3
    assert float(pen) == pytest.approx(3.0)


def test_regularized_training_shrinks_kernels():
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2,
                 optimizer='sgd', lr=0.1)
    bundle = get_model(cfg)
    from challenge_tpu.train.losses import get_loss
    reg_loss = apply_kernel_regularizer(get_loss(cfg), l1_l2(l2=1.0))
    step, opt = make_train_step(bundle, loss_fn=reg_loss, use_agc=False)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    x = jnp.zeros((2, 80, 64, 2))
    y = jnp.zeros((2, 2, 3))
    k0 = float(jnp.sum(jnp.square(
        state.params['ConvMPBlock_0']['Conv_0']['kernel'])))
    for i in range(3):
        state, m = step(state, (x, y), jax.random.PRNGKey(i))
    k1 = float(jnp.sum(jnp.square(
        state.params['ConvMPBlock_0']['Conv_0']['kernel'])))
    assert k1 < k0          # l2 decay pulls kernels toward zero


@pytest.mark.slow
def test_full_train_state_roundtrip(tmp_path):
    """Orbax resume: params + optimizer state + SWA + step survive
    (the reference never persists optimizer state, SURVEY §5.4)."""
    from challenge_tpu.train import restore_train_state, save_train_state
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    step, opt = make_train_step(bundle)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 64, 2))
    y = jnp.zeros((2, 2, 3))
    state, _ = step(state, (x, y), jax.random.PRNGKey(2))

    save_train_state(str(tmp_path / 'ckpt'), state)
    target = init_state(bundle, jax.random.PRNGKey(9), opt)
    restored = restore_train_state(str(tmp_path / 'ckpt'), target)
    assert int(restored.step) == 1
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x_, y_ in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))
    # resumed state trains on
    restored, metrics = step(restored, (x, y), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics['loss']))


@pytest.mark.slow
def test_checkpoint_history_and_non_latest_restore(tmp_path):
    """Periodic saves keep step-suffixed history with retention; resume from
    a NON-latest checkpoint works (VERDICT r1 weak #7)."""
    from challenge_tpu.train import (
        checkpoint_steps, restore_train_state, save_train_state)
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    step, opt = make_train_step(bundle)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 64, 2))
    y = jnp.zeros((2, 2, 3))

    ckpt = str(tmp_path / 'hist')
    saved_params = {}
    for i in range(4):
        state, _ = step(state, (x, y), jax.random.PRNGKey(2 + i))
        save_train_state(ckpt, state, max_to_keep=3)
        saved_params[int(state.step)] = jax.device_get(state.params)

    steps = checkpoint_steps(ckpt)
    assert steps == [2, 3, 4]  # step 1 evicted by max_to_keep=3

    target = init_state(bundle, jax.random.PRNGKey(9), opt)
    mid = restore_train_state(ckpt, target, step=3)
    assert int(mid.step) == 3
    for a, b in zip(jax.tree.leaves(mid.params),
                    jax.tree.leaves(saved_params[3])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # default restore = latest
    last = restore_train_state(ckpt, target)
    assert int(last.step) == 4


def test_restore_structure_mismatch_is_diagnosed(tmp_path):
    """A checkpoint that EXISTS but does not match the live train-state
    pytree (e.g. saved before the sgd/rmsprop opt states became
    exact-Keras) must fail with a clear ValueError, not Orbax internals —
    and must NOT be silently treated as 'start fresh'."""
    import pytest
    from challenge_tpu.train import restore_train_state, save_train_state

    cfg_a = Config(model_type='vad', v=3, n_frame=64, batch_size=2,
                   optimizer='adam')
    bundle = get_model(cfg_a)
    _, opt_a = make_train_step(bundle)
    state_a = init_state(bundle, jax.random.PRNGKey(0), opt_a)
    save_train_state(str(tmp_path / 'ckpt'), state_a)

    cfg_b = Config(model_type='vad', v=3, n_frame=64, batch_size=2,
                   optimizer='sgd')
    bundle_b = get_model(cfg_b)
    _, opt_b = make_train_step(bundle_b)
    target = init_state(bundle_b, jax.random.PRNGKey(0), opt_b)
    with pytest.raises(ValueError, match='train-state structure'):
        restore_train_state(str(tmp_path / 'ckpt'), target)


def test_compile_cache_keyed_by_host_cpu_features():
    """The persistent compilation cache must be namespaced per host CPU
    feature set: XLA:CPU AOT executables embed the compiling machine's
    features, and reusing one on a lesser host is a latent SIGILL
    (cpu_aot_loader warns about exactly this when a shared-home cache
    crosses heterogeneous hosts — seen in MULTICHIP_r04's tail)."""
    import challenge_tpu

    fp = challenge_tpu._host_cache_fingerprint()
    assert fp == challenge_tpu._host_cache_fingerprint()
    assert len(fp) == 12
    int(fp, 16)   # hex digest prefix
    d = jax.config.jax_compilation_cache_dir
    if d and 'challenge_tpu_jax' in d:   # not overridden by the user env
        assert os.path.basename(d.rstrip('/')) == fp, d


def test_dryrun_stderr_filter_drops_only_aot_pseudofeature_lines():
    """__graft_entry__'s dryrun wraps itself in an fd-level stderr filter
    for ONE known same-host false positive (the XLA:CPU AOT loader warning
    about LLVM tuning pseudo-features like +prefer-no-scatter on every
    persistent-cache hit). The filter must drop exactly that line class and
    pass everything else — including C++-style writes straight to fd 2 —
    through unmodified."""
    import importlib.util
    import tempfile

    spec = importlib.util.spec_from_file_location(
        'graft_entry_for_test',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    with tempfile.TemporaryFile() as cap:
        saved = os.dup(2)
        os.dup2(cap.fileno(), 2)
        try:
            with mod._drop_cpu_aot_pseudofeature_warnings():
                os.write(2, b'E0000 00:00:00 1 cpu_aot_loader.cc:210] '
                            b'Loading XLA:CPU AOT result. Target machine '
                            b'feature +prefer-no-scatter is not supported '
                            b'on the host machine.\n')
                # a GENUINE capability mismatch (user-overridden shared
                # cache dir across heterogeneous hosts) names a real
                # feature — must pass through
                os.write(2, b'E0000 00:00:00 1 cpu_aot_loader.cc:210] '
                            b'Loading XLA:CPU AOT result. Target machine '
                            b'feature +avx512f is not supported '
                            b'on the host machine.\n')
                os.write(2, b'a real error line\n')
                os.write(2, b'partial tail without newline')
        finally:
            os.dup2(saved, 2)
            os.close(saved)
        cap.seek(0)
        out = cap.read()
    assert b'prefer-no-scatter' not in out, out
    assert b'+avx512f is not supported' in out, out   # real mismatch kept
    assert b'a real error line\n' in out, out
    assert out.endswith(b'partial tail without newline'), out
