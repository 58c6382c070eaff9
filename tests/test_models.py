"""Model-family shape and behavior tests (the reference ships no model tests;
coverage added per SURVEY.md §4 'Untested')."""

import jax
import jax.numpy as jnp
import pytest

from challenge_tpu.config import Config
from challenge_tpu.models import get_density_model, get_model

KEY = jax.random.PRNGKey(0)


def fwd(bundle, batch=2, training=False):
    vs = bundle.init(KEY)
    x = jnp.ones((batch,) + bundle.input_shape, jnp.float32)
    if training:
        rngs = {'dropout': KEY} if bundle.needs_dropout_rng else None
        return jax.jit(
            lambda v, x: bundle.apply(v, x, training=True, rngs=rngs))(vs, x)
    return jax.jit(lambda v, x: bundle.apply(v, x))(vs, x)


@pytest.mark.parametrize('v', [1, 6, 7, 8, 9])
def test_vad_versions(v):
    cfg = Config(model_type='vad', v=v, n_mels=80, n_frame=64, n_chan=2)
    out = fwd(get_model(cfg))
    # 5 pool-by-2 stages downsample time x32 (reference: sj_train.py:223,242)
    assert out.shape == (2, 64 // 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid head


def test_vad_v8_wider():
    cfg = Config(model_type='vad', v=8, n_frame=64)
    bundle = get_model(cfg)
    vs = bundle.init(KEY)
    # base fsize 48 (reference: sj_train.py:216-217)
    k = vs['params']['ConvMPBlock_0']['Conv_0']['kernel']
    assert k.shape[-1] == 48


@pytest.mark.slow
def test_vad_train_mode_updates_batch_stats():
    cfg = Config(model_type='vad', v=1, n_frame=64)
    bundle = get_model(cfg)
    vs = bundle.init(KEY)
    x = jax.random.normal(KEY, (2,) + bundle.input_shape)
    out, new_stats = bundle.apply(vs, x, training=True)
    old = jax.tree.leaves(vs['batch_stats'])
    new = jax.tree.leaves(new_stats)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(old, new))


@pytest.mark.parametrize('v,t_out', [(1, 512), (3, 16), (5, 8), (6, 16), (7, 16)])
@pytest.mark.slow
def test_eff_versions(v, t_out):
    cfg = Config(model_type='eff', model=0, v=v, n_mels=80, n_frame=512,
                 n_chan=2)
    out = fwd(get_model(cfg))
    assert out.shape == (2, t_out, 3)


@pytest.mark.slow
def test_eff_train_mode_forward_with_dropout_rng():
    """Training-mode forward through fwd()'s dropout-rng branch: the
    EfficientNet family needs a dropout rng and returns (out, new_stats)."""
    cfg = Config(model_type='eff', v=3, model=0, n_mels=40, n_frame=64,
                 n_chan=2)
    out, new_stats = fwd(get_model(cfg), training=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert new_stats   # batch stats were collected


@pytest.mark.parametrize('v', [2, 4])
def test_eff_deprecated_versions_raise(v):
    with pytest.raises(ValueError, match='deprecated'):
        get_model(Config(model_type='eff', v=v))


def test_se_cascade_outputs_and_mask():
    cfg = Config(model_type='se', v=9, n_frame=64, n_chan=2)
    bundle = get_model(cfg)
    outs = fwd(bundle)
    assert outs[0].shape == (2, 64 // 32, 3)
    assert outs[1].shape == (2, 256, 64, 2)      # speech
    assert outs[2].shape == (2, 256, 64, 2)      # noise

    vs = bundle.init(KEY)
    fin = bundle.trainable_mask(vs['params'])
    pre = get_model(cfg.replace(pretrain=True)).trainable_mask(vs['params'])
    fin_l, pre_l = jax.tree.leaves(fin), jax.tree.leaves(pre)
    # pretrain and finetune masks partition the parameters exactly
    assert all(a != b for a, b in zip(fin_l, pre_l))
    assert 0 < sum(fin_l) < len(fin_l)


def test_density_model():
    cfg = Config(model_type='eff', model=0, n_mels=80, n_frame=64, n_chan=2)
    out = fwd(get_density_model(cfg))
    assert out.shape == (2, 2, 3)
    assert float(out.min()) >= 0.0               # relu head


@pytest.mark.slow
def test_bfloat16_compute_mode():
    """compute_dtype='bfloat16' keeps params f32, outputs f32, loss finite."""
    cfg = Config(model_type='vad', v=3, n_frame=64, n_chan=2,
                 compute_dtype='bfloat16')
    bundle = get_model(cfg)
    vs = bundle.init(KEY)
    assert jax.tree.leaves(vs['params'])[0].dtype == jnp.float32
    x = jax.random.normal(KEY, (2,) + bundle.input_shape)
    out = jax.jit(lambda v, x: bundle.apply(v, x))(vs, x)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())
    # f32 and bf16 agree loosely (same params)
    out32 = get_model(cfg.replace(compute_dtype='float32')).apply(vs, x)
    assert float(jnp.abs(out - out32).max()) < 0.1


def test_effnet_scaling():
    from challenge_tpu.models.effnet import round_filters, round_repeats
    # Keras-published values for B0 -> B4 width/depth rounding
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.4) == 48          # B4 stem
    assert round_filters(1280, 1.1) == 1408      # B2 head
    assert round_repeats(3, 1.8) == 6            # B4


def test_bundle_summary_counts_params():
    """model.summary() analogue (reference: sj_train.py:464): the printed
    total equals the true parameter count."""
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_model
    bundle = get_model(Config(model_type='vad', v=1, n_frame=64))
    variables = bundle.init(jax.random.PRNGKey(0))
    text = bundle.summary(variables)
    true_total = sum(int(x.size)
                     for x in jax.tree.leaves(variables['params']))
    assert f'{true_total:,}' in text
    assert 'VADModel' in text
