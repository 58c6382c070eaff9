"""Config/run-name grammar tests (the grammar is de-facto API —
reference: sj_train.py:424-429, eval.py:48-60) and the name-substring
behavior switches (reference: sj_train.py:116,121)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from challenge_tpu.config import Config, parse_run_name


@pytest.mark.parametrize('kw', [
    dict(model_type='vad', v=1),
    dict(model_type='vad', v=9, lr=5e-4, batch_size=24, n_mels=128),
    dict(model_type='eff', model=4, v=5, optimizer='sgd', loss='FOCAL'),
    dict(model_type='se', v=9, n_frame=2048, n_chan=3),
    dict(model_type='eff', model=0, v=7, name='myexp_filter'),
])
def test_run_name_roundtrip(kw):
    cfg = Config(**kw)
    parsed = parse_run_name(Config(), cfg.run_name())
    for field in ('model_type', 'v', 'lr', 'batch_size', 'optimizer',
                  'n_mels', 'n_chan', 'n_frame'):
        assert getattr(parsed, field) == getattr(cfg, field), field
    if cfg.model_type == 'eff':
        assert parsed.model == cfg.model


def test_reference_name_example():
    cfg = Config(model_type='vad', v=3, batch_size=2, n_frame=64)
    assert cfg.run_name() == \
        'vad_v3_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'


def test_additive_bool_flags_parse_false():
    """The additive TPU-native bool flags (--remat/--resume) must honor an
    explicit 'False'/'0', unlike the reference's own flags which keep its
    type=bool argparse quirk (any non-empty string is True,
    sj_train.py:23) verbatim."""
    from challenge_tpu.config import config_from_args

    cfg = config_from_args(['--remat', 'False', '--resume', '0',
                            '--keras_ckpt', 'no', '--bank_shard', 'False'])
    assert cfg.remat is False and cfg.resume is False
    assert cfg.keras_ckpt is False and cfg.bank_shard is False
    cfg = config_from_args(['--remat', 'True', '--resume', 'true',
                            '--keras_ckpt', 'True'])
    assert cfg.remat is True and cfg.resume is True
    assert cfg.keras_ckpt is True
    # the reference quirk, preserved: --pretrain False still means True
    cfg = config_from_args(['--pretrain', 'False'])
    assert cfg.pretrain is True
    # bank_dtype typos die at the argparse boundary with the valid choices
    with pytest.raises(SystemExit):
        config_from_args(['--bank_dtype', 'bf16'])


def _mel_batch(cfg, seed=0):
    from challenge_tpu.data.pipeline import DevicePipeline, build_banks
    rng = np.random.default_rng(seed)
    banks = build_banks(
        [np.abs(rng.standard_normal((257, 94, 4))).astype('f4') + 0.1
         for _ in range(2)],
        [np.abs(rng.standard_normal((257, 40, 4))).astype('f4') + 0.1
         for _ in range(3)],
        rng.integers(0, 3, size=3),
        [np.abs(rng.standard_normal((257, 20, 4))).astype('f4') + 0.1
         for _ in range(2)])
    pipe = DevicePipeline(banks, cfg, training=False, seed=5)
    x, y = next(iter(pipe))
    return np.asarray(x)


def test_name_substring_switches():
    """'nominmax' in the run name disables minmax; default applies it
    (reference: sj_train.py:121-123). With minmax the per-sample max of
    exp(mel) is 1."""
    base = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    x_minmax = _mel_batch(base)
    x_nominmax = _mel_batch(base.replace(name='nominmax'))
    np.testing.assert_allclose(
        np.exp(x_minmax).max(axis=(1, 2, 3)), 1.0, rtol=1e-5)
    assert not np.allclose(x_minmax, x_nominmax)


def test_filter_name_switch_is_noop_through_mel():
    """'filter' in the run name zeroes STFT rows 1..3 (~31-94 Hz) before mel
    (reference: sj_train.py:116-117) — but the mel filterbank's lower edge is
    125 Hz (= bin 4), so those rows carry ZERO mel weight and the train-time
    filter is a no-op through the feature chain. Reference quirk, preserved
    and pinned here."""
    from challenge_tpu.ops.mel import linear_to_mel_weight_matrix
    m = linear_to_mel_weight_matrix(80)
    np.testing.assert_allclose(m[:4].sum(), 0.0)

    base = Config(model_type='vad', v=3, n_frame=64, batch_size=2,
                  name='nominmax')
    x_plain = _mel_batch(base)
    x_filt = _mel_batch(base.replace(name='nominmax_filter'))
    np.testing.assert_allclose(x_filt, x_plain, atol=1e-6)
