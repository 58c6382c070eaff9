"""CLI entry-point tests: sj_train -> eval -> get_csv_data on synthetic
pickled spec sets (the reference's entry points are untested, SURVEY §4)."""

import json
import os

import numpy as np
import pytest

from _helpers import DATA_FLAGS, make_datafiles as _make_datafiles
from _helpers import write_wav as _write_wav


@pytest.mark.slow
def test_sj_train_eval_csv_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.sj_train import main as sj_main
    argv = ['--model_type', 'vad', '--v', '3', '--n_frame', '64',
            '--batch_size', '2', '--epochs', '2', '--steps_per_epoch', '2',
            '--datapath', str(tmp_path)] + DATA_FLAGS
    sj_main(argv)

    run = 'vad_v3_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    assert os.path.exists(f'{run}.h5')
    assert os.path.exists(f'{run}_SWA.h5')
    assert os.path.exists(f'{run}.csv')

    # ---- eval CLI with --p name parsing on synthesized dev wavs
    _write_wav(tmp_path / 'clip01.wav', seed=1)
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[0, 1.0, 2.0]]}}, f)
    from challenge_tpu.cli.eval import main as eval_main
    scores = eval_main(['--name', run, '--p'])
    assert len(scores) == 1 and np.isfinite(scores[0])

    # ---- results aggregator over the training log + checkpoints
    from challenge_tpu.cli.get_csv_data import main as csv_main
    csv_main(argv=['--patience', '10'] + ['--path', str(tmp_path)])
    with open(tmp_path / 'result.csv') as f:
        rows = f.read().splitlines()
    assert rows[0].startswith('이름')
    assert len(rows) == 2 and run in rows[1]


@pytest.mark.slow
def test_sj_train_keras_ckpt_trio(tmp_path, monkeypatch):
    """--keras_ckpt True writes the {run}.h5/_SWA.h5 trio as REAL Keras
    legacy HDF5 (reference tooling can load_weights them directly), and
    our own eval CLI auto-detects and evaluates them."""
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.sj_train import main as sj_main
    argv = ['--model_type', 'vad', '--v', '3', '--n_frame', '64',
            '--batch_size', '2', '--epochs', '2', '--steps_per_epoch', '2',
            '--keras_ckpt', 'True',
            '--datapath', str(tmp_path)] + DATA_FLAGS
    sj_main(argv)

    run = 'vad_v3_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    magic = b'\x89HDF\r\n\x1a\n'
    for suffix in ('.h5', '_SWA.h5'):
        with open(f'{run}{suffix}', 'rb') as f:
            assert f.read(8) == magic, f'{suffix} is not HDF5'

    # the importer reads it back into the same param tree
    from challenge_tpu.config import Config
    from challenge_tpu.interop import load_keras_h5_variables
    from challenge_tpu.models import get_model
    bundle = get_model(Config(model_type='vad', v=3, n_frame=64, n_chan=2))
    variables = load_keras_h5_variables(bundle, f'{run}.h5')
    assert 'params' in variables and 'batch_stats' in variables

    # and the eval CLI auto-detects the Keras format
    _write_wav(tmp_path / 'clip01.wav', seed=1)
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[0, 1.0, 2.0]]}}, f)
    from challenge_tpu.cli.eval import main as eval_main
    scores = eval_main(['--name', run, '--p'])
    assert len(scores) == 1 and np.isfinite(scores[0])


@pytest.mark.slow
def test_sj_train_ckpt_resume(tmp_path, monkeypatch):
    """--ckpt_dir/--resume: the run checkpoints its full train state with
    Orbax and a restarted run continues from the restored step and epoch
    (the reference only ever persisted weights — SURVEY §5.4)."""
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.sj_train import main as sj_main
    from challenge_tpu.train import checkpoint_steps
    base = ['--model_type', 'vad', '--v', '3', '--n_frame', '64',
            '--batch_size', '2', '--steps_per_epoch', '2',
            '--datapath', str(tmp_path),
            '--ckpt_dir', str(tmp_path / 'ckpts'),
            '--ckpt_every_epochs', '1'] + DATA_FLAGS
    sj_main(base + ['--epochs', '2'])
    steps = checkpoint_steps(str(tmp_path / 'ckpts'))
    assert steps and max(steps) == 4          # 2 epochs x 2 steps

    # the resumed run reaches epoch index 2 -> the every-5-epochs eval
    # callback fires and needs a dev set in cwd
    _write_wav(tmp_path / 'clip01.wav', seconds=4.0, seed=1)
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[0, 1, 2]]}}, f)

    out = []

    class Capture:
        def write(self, s):
            out.append(s)

        def flush(self):
            pass
    import contextlib
    import sys as _sys
    with contextlib.redirect_stdout(Capture()):
        # bool flags take a value (the reference's argparse type=bool quirk)
        sj_main(base + ['--epochs', '4', '--resume', 'True'])
    text = ''.join(out)
    assert 'resumed from step 4 (epoch 2)' in text
    # continued for the REMAINING epochs only (3 and 4)
    assert 'Epoch 3/4' in text and 'Epoch 4/4' in text
    assert 'Epoch 1/4' not in text
    assert max(checkpoint_steps(str(tmp_path / 'ckpts'))) == 8


@pytest.mark.slow
def test_get_csv_data_real_evaluation(tmp_path, monkeypatch):
    """The aggregator's real-eval branch (reference: get_csv_data.py:76-107):
    a long training log (> patience + 5 epochs) triggers re-evaluation of
    each checkpoint against the dev wavs."""
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_model
    from challenge_tpu.train import save_weights
    monkeypatch.chdir(tmp_path)
    run = 'vad_v3_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    # fake a 20-epoch log
    with open(f'{run}.csv', 'w') as f:
        f.write('epoch,loss,val_er\n')
        for e in range(20):
            f.write(f'{e},0.5,1.0\n')
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    vs = bundle.init(jax.random.PRNGKey(0))
    save_weights(f'{run}.h5', vs)
    save_weights(f'{run}_SWA.h5', vs)
    _write_wav(tmp_path / 'clip01.wav', seconds=4.0, seed=2)
    with open('sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[0, 1.0, 2.0]]}}, f)

    from challenge_tpu.cli.get_csv_data import main as csv_main
    csv_main(argv=['--patience', '10', '--path', str(tmp_path)])
    rows = open('result.csv').read().splitlines()
    assert len(rows) == 2
    cells = rows[1].split(',')
    # test_er and swa_test_er columns hold real (finite) scores
    assert float(cells[-3]) >= 0 and float(cells[-2]) >= 0
    assert cells[-1] == 'None'          # no _sample.h5 checkpoint


@pytest.mark.slow
def test_get_csv_data_reference_keras_trio(tmp_path, monkeypatch):
    """The aggregator re-evaluates REFERENCE-era Keras .h5 checkpoints
    transparently (reference workflow: get_csv_data.py:80-102 over
    reference-trained runs)."""
    import contextlib
    import sys as _sys
    monkeypatch.chdir(tmp_path)
    run = 'vad_v1_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    with open(f'{run}.csv', 'w') as f:
        f.write('epoch,loss,val_er\n')
        for e in range(20):
            f.write(f'{e},0.5,1.0\n')

    # build a REFERENCE Keras vad model and save a legacy trio
    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.test_keras_h5 import (
        _ref_config, _randomize_keras_weights, reference_modules)
    from challenge_tpu.interop.keras_h5 import export_keras_legacy_h5
    with reference_modules() as (ref_sj, _):
        km = ref_sj.get_model(_ref_config(v=1, n_mels=80, n_frame=64))
        _randomize_keras_weights(km, seed=13)
        export_keras_legacy_h5(km, f'{run}.h5')
        export_keras_legacy_h5(km, f'{run}_SWA.h5')

    _write_wav(tmp_path / 'clip01.wav', seconds=4.0, seed=2)
    with open('sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[0, 1, 2]]}}, f)

    from challenge_tpu.cli.get_csv_data import main as csv_main
    csv_main(argv=['--patience', '10', '--path', str(tmp_path)])
    rows = open('result.csv').read().splitlines()
    assert len(rows) == 2
    cells = rows[1].split(',')
    assert float(cells[-3]) >= 0 and float(cells[-2]) >= 0


@pytest.mark.slow
def test_eval_se_model_path(tmp_path, monkeypatch):
    """evaluate() se branch: speech_enhancement_preprocess layout + triple
    head (reference: metrics.py:55-57,64-65)."""
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_model
    from challenge_tpu.evaluate import evaluate
    monkeypatch.chdir(tmp_path)
    _write_wav(tmp_path / 'clip01.wav', seconds=10.0, seed=4)
    with open('sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip01': [[1, 2.0, 4.0]]}}, f)
    cfg = Config(model_type='se', v=9, n_frame=512, n_chan=2)
    bundle = get_model(cfg)
    vs = bundle.init(jax.random.PRNGKey(0))
    scores = evaluate(cfg, bundle, vs, eval_dir=str(tmp_path))
    assert len(scores) == 1 and np.isfinite(scores[0])


@pytest.mark.slow
def test_trainer_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.trainer import main as trainer_main
    trainer_main(['--name', 'dens', '--model', 'EfficientNetB0',
                  '--n_frame', '64', '--n_chan', '2', '--batch_size', '2',
                  '--epochs', '2', '--steps_per_epoch', '2',
                  '--bank_dtype', 'bfloat16',   # additive knob plumb-through
                  '--keras_ckpt', 'True',       # density-family Keras trio
                  '--datapath', str(tmp_path),
                  '--background_sounds', 'bg.pickle',
                  '--voices', 'voice.pickle', '--labels', 'labels.npy',
                  '--noises', 'noise.pickle',
                  '--test_background_sounds', 'test_bg.pickle',
                  '--test_voices', 'test_voice.pickle',
                  '--test_labels', 'test_labels.npy'])
    assert os.path.exists('dens.h5')
    assert os.path.exists('dens_SWA.h5')
    assert os.path.exists('dens.log')
    # --keras_ckpt works on THIS entry too (it was sj_train-only once):
    # real Keras HDF5, not flax msgpack in disguise
    magic = b'\x89HDF\r\n\x1a\n'
    for fname in ('dens.h5', 'dens_SWA.h5'):
        with open(fname, 'rb') as f:
            assert f.read(8) == magic, f'{fname} is not HDF5'
    # density metrics are cos_sim only (reference trainer.py:252-253
    # compiles metrics=[cos_sim]; er/f1 over soft 30-dim density labels
    # would be meaningless)
    with open('dens.log') as f:
        header = f.readline().strip().split(',')
    assert 'cos_sim' in header and 'val_cos_sim' in header
    assert 'er' not in header and 'f1_score' not in header


@pytest.mark.slow
def test_sj_train_cli_multichip_bank_shard(tmp_path, monkeypatch):
    """The training CLI scales out by itself: a batch that divides the
    8-device mesh builds the DP mesh, and --bank_shard splits the spec
    banks' clip axis across it (dataset capacity scales with chips)."""
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.sj_train import main as sj_main
    argv = ['--model_type', 'vad', '--v', '3', '--n_frame', '64',
            '--batch_size', '8', '--epochs', '1', '--steps_per_epoch', '2',
            '--bank_shard', 'True',
            '--datapath', str(tmp_path)] + DATA_FLAGS
    sj_main(argv)
    run = 'vad_v3_lr0.001_batch8_opt_adam_mel80_chan2_BCE_framelen64'
    assert os.path.exists(f'{run}.csv')


@pytest.mark.slow
def test_trainer_cli_multichip(tmp_path, monkeypatch):
    """The density trainer rides the fused DP-mesh path when the batch
    divides the devices (30-class labels through the fused step)."""
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.trainer import main as trainer_main
    trainer_main(['--name', 'densm', '--model', 'EfficientNetB0',
                  '--n_frame', '64', '--n_chan', '2', '--batch_size', '8',
                  '--epochs', '2', '--steps_per_epoch', '2',
                  '--n_classes', '30', '--bank_shard', 'True',
                  '--datapath', str(tmp_path),
                  '--background_sounds', 'bg.pickle',
                  '--voices', 'voice.pickle', '--labels', 'labels.npy',
                  '--noises', 'noise.pickle',
                  '--test_background_sounds', 'test_bg.pickle',
                  '--test_voices', 'test_voice.pickle',
                  '--test_labels', 'test_labels.npy'])
    assert os.path.exists('densm.h5')
    assert os.path.exists('densm_SWA.h5')


@pytest.mark.slow
def test_trainer_cli_grad_accum(tmp_path, monkeypatch):
    """--grad_accum is exposed on the density trainer too (round-3 advisor
    finding: it was sj_train-only) and forces the fused banks mode that
    implements it, even single-device."""
    monkeypatch.chdir(tmp_path)
    _make_datafiles(tmp_path)
    from challenge_tpu.cli.trainer import main as trainer_main
    trainer_main(['--name', 'densga', '--model', 'EfficientNetB0',
                  '--n_frame', '64', '--n_chan', '2', '--batch_size', '2',
                  '--epochs', '2', '--steps_per_epoch', '2',
                  '--grad_accum', '2',
                  '--datapath', str(tmp_path),
                  '--background_sounds', 'bg.pickle',
                  '--voices', 'voice.pickle', '--labels', 'labels.npy',
                  '--noises', 'noise.pickle',
                  '--test_background_sounds', 'test_bg.pickle',
                  '--test_voices', 'test_voice.pickle',
                  '--test_labels', 'test_labels.npy'])
    assert os.path.exists('densga.h5')
    assert os.path.exists('densga_SWA.h5')


@pytest.mark.slow
def test_get_csv_data_aggregates_se_runs(tmp_path, monkeypatch):
    """'se' run logs must aggregate: the reference's find('B') tokenizer
    lands on the BCE loss token for se filenames and crashes its own
    aggregator (reference get_csv_data.py:39-43) — our anchor on the
    'se_v' model token makes the supported family work (documented
    deliberate fix)."""
    monkeypatch.chdir(tmp_path)
    run = 'se_v9_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    with open(tmp_path / f'{run}.csv', 'w') as f:
        f.write('epoch,loss,val_loss\n0,1.0,1.1\n1,0.9,1.0\n')
    from challenge_tpu.cli.get_csv_data import main as csv_main
    csv_main(argv=['--patience', '10', '--path', str(tmp_path)])
    with open(tmp_path / 'result.csv') as f:
        rows = f.read().splitlines()
    assert len(rows) == 2 and run in rows[1]
    cols = rows[1].split(',')
    assert cols[1] == 'se' and cols[2] == '9'


def test_get_csv_data_skips_foreign_csvs(tmp_path, monkeypatch):
    """One stray non-run-log CSV in --path must not lose every row (the
    reference IndexErrors out of the whole aggregation)."""
    monkeypatch.chdir(tmp_path)
    run = 'se_v9_lr0.001_batch2_opt_adam_mel80_chan2_BCE_framelen64'
    with open(tmp_path / f'{run}.csv', 'w') as f:
        f.write('epoch,loss\n0,1.0\n')
    with open(tmp_path / 'notes.csv', 'w') as f:
        f.write('a,b\n1,2\n')
    from challenge_tpu.cli.get_csv_data import main as csv_main
    csv_main(argv=['--patience', '10', '--path', str(tmp_path)])
    with open(tmp_path / 'result.csv') as f:
        rows = f.read().splitlines()
    assert len(rows) == 2 and run in rows[1]
