"""AOT serving export (interop/aot.py): the inference forward serializes
to a self-contained StableHLO artifact that reproduces the live model's
outputs without model code or weights, across batch sizes (symbolic batch
dim). Reference contrast: eval.py:63-65 must rebuild the architecture in
Python before load_weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from challenge_tpu.config import Config
from challenge_tpu.interop.aot import export_infer, load_infer
from challenge_tpu.models import get_model


@pytest.fixture(scope='module')
def vad_bundle():
    bundle = get_model(Config(model_type='vad', v=1, n_mels=40, n_frame=64,
                              n_chan=2))
    variables = bundle.init(jax.random.PRNGKey(0))
    return bundle, variables


def test_aot_roundtrip_symbolic_batch(vad_bundle, tmp_path):
    bundle, variables = vad_bundle
    path = str(tmp_path / 'vad_v1.hlo')
    data = export_infer(bundle, variables, path=path)
    assert open(path, 'rb').read() == data

    fn = load_infer(path)
    rng = np.random.default_rng(0)
    # one artifact, two different batch sizes: proves the symbolic dim
    for b in (2, 5):
        x = rng.standard_normal((b,) + bundle.input_shape).astype('f4')
        want = np.asarray(bundle.apply(variables, jnp.asarray(x)))
        got = np.asarray(fn(jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_aot_rnn_head_and_static_batch(tmp_path):
    """vad v9 (BiLSTM): the symbolic batch holds through the time-scan
    RNN, and batch_size pins one static program when asked."""
    bundle = get_model(Config(model_type='vad', v=9, n_mels=40, n_frame=64,
                              n_chan=2))
    variables = bundle.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)

    fn_sym = load_infer(export_infer(bundle, variables))
    for b in (2, 3):
        x = rng.standard_normal((b,) + bundle.input_shape).astype('f4')
        want = np.asarray(bundle.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(fn_sym(jnp.asarray(x))),
                                   want, rtol=1e-5, atol=2e-5)

    fn_static = load_infer(export_infer(bundle, variables, batch_size=2))
    x = rng.standard_normal((2,) + bundle.input_shape).astype('f4')
    want = np.asarray(bundle.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(fn_static(jnp.asarray(x))),
                               want, rtol=1e-5, atol=2e-5)
    with pytest.raises(Exception):
        fn_static(jnp.zeros((3,) + bundle.input_shape, jnp.float32))


def test_aot_artifact_needs_no_live_variables(vad_bundle):
    """The weights ride inside the artifact: outputs vary with the
    exported variables, not whatever is in scope at load time."""
    bundle, variables = vad_bundle
    other = bundle.init(jax.random.PRNGKey(42))
    data = export_infer(bundle, variables)
    data_other = export_infer(bundle, other)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2,) + bundle.input_shape).astype('f4'))
    y1 = np.asarray(load_infer(data)(x))
    y2 = np.asarray(load_infer(data_other)(x))
    assert np.abs(y1 - y2).max() > 1e-4


@pytest.mark.slow
def test_eval_cli_export_aot(tmp_path, monkeypatch):
    """--export_aot on the eval CLI: one command from a saved checkpoint
    to a serving artifact that reproduces the loaded model."""
    import json

    from _helpers import write_wav
    from challenge_tpu.train import save_weights

    monkeypatch.chdir(tmp_path)
    run = 'vad_v1_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    bundle = get_model(Config(model_type='vad', v=1, n_frame=64, n_chan=2))
    variables = bundle.init(jax.random.PRNGKey(3))
    save_weights(f'{run}.h5', variables)

    write_wav(tmp_path / 'clip01.wav', seed=1)
    with open('sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[0, 1.0, 2.0]]}}, f)

    from challenge_tpu.cli.eval import main as eval_main
    scores = eval_main(['--name', run, '--p',
                        '--export_aot', 'serve.hlo'])
    assert len(scores) == 1 and np.isfinite(scores[0])

    fn = load_infer('serve.hlo')
    x = np.random.default_rng(4).standard_normal(
        (2,) + bundle.input_shape).astype('f4')
    want = np.asarray(bundle.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), want,
                               rtol=1e-5, atol=2e-5)
