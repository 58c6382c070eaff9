"""Experiment-results aggregator (reference: get_csv_data.py:12-119).

Walks ``--path`` for training CSV logs, parses hyperparameters back out of
each filename, rebuilds the model, re-evaluates the {run}.h5 / {run}_SWA.h5 /
{run}_sample.h5 checkpoint trio with overlap_hop = framelen // 2, and writes
``result.csv`` (headers preserved verbatim, Korean included).
"""

from __future__ import annotations

import csv
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from challenge_tpu.config import config_from_args
from challenge_tpu.evaluate import evaluate
from challenge_tpu.models import get_model
from challenge_tpu.train import load_weights

CATEGORY = ['이름', '모델', 'version', 'batch', 'lr', 'optimizer',
            'loss function', 'input', 'chan', 'output', 'epoch', 'cos_sim',
            'er', 'f1_score', 'loss', 'val_cos_sim', 'val_er', 'val_f1_score',
            'val_loss', 'test_er', 'swa_test_er', 'sample_test_er']


def main(config=None, argv=None):
    if config is None:
        config = config_from_args(argv, extra={
            '--path': dict(type=str, default='')})
    data_path = getattr(config, 'extra_args', {}).get('path', '') or \
        getattr(config, 'path', '')
    paths = sorted(glob(os.path.join(data_path, '*.csv')))
    result_path = os.path.join(data_path, 'result.csv')
    prev_lines = [CATEGORY]

    for path in paths:
        if path == result_path:
            continue
        lines = []
        with open(path, 'r') as f:
            for i, line in enumerate(csv.reader(f)):
                if i == 0:
                    continue
                lines.append(line)
        if not lines:
            continue
        data = lines[max(len(lines) - config.patience, 0)]
        filename = os.path.splitext(path.split('/')[-1])[0]
        if 'vad' in filename:
            name = filename[filename.find('vad'):].split('_')
        elif 'se_v' in filename:
            # the reference's find('B') scan lands on the BCE loss token
            # for 'se' runs and crashes its own aggregator
            # (get_csv_data.py:39-43), making its `elif 'se' in name`
            # branch unreachable; anchoring on the se model token makes
            # the supported family aggregate (deliberate fix, NOTES.md)
            name = filename[filename.find('se_v'):].split('_')
        else:
            name = filename[filename.find('B'):].split('_')
        try:
            model_name = name[0]
            version = name[1][1:]
            lr = name[2][2:]
            batch = name[3].split('batch')[-1]
            opt = name[5]
            n_mel = name[6].split('mel')[-1]
            chan = name[7].split('chan')[-1]
            loss = name[8]
            framelen = name[9].split('framelen')[-1]
        except IndexError:
            # a CSV that is not a run log (the reference crashes the whole
            # aggregation here; one stray file should not lose every row)
            print(f'skipping {filename!r}: not a run-name-grammar log')
            continue
        if 'vad' in name:
            config.model_type = 'vad'
        elif 'se' in name:
            config.model_type = 'se'
        else:
            config.model_type = 'eff'
        evaluation = max(len(lines) - config.patience, 0) > 5

        config.model = int(model_name[1:]) if model_name[1:].isdigit() else 0
        config.v = int(version)
        config.n_mels = int(n_mel)
        config.n_chan = int(chan)
        config.n_frame = int(framelen)
        try:
            bundle = get_model(config)
        except ValueError:
            continue

        # output-shape column: abstract evaluation only (the reference
        # reads model.output.shape statically) — a real compiled forward
        # here would pay a full XLA compile per CSV file just to print a
        # tuple
        variables = bundle.init(jax.random.PRNGKey(0))
        probe = jax.eval_shape(bundle.apply, variables,
                               jax.ShapeDtypeStruct(
                                   (1,) + bundle.input_shape, jnp.float32))
        if config.model_type == 'se':
            output = str(tuple(probe[0].shape[1:]))
        else:
            output = str(tuple(probe.shape[1:]))
        row = [filename, 'vad' if config.model_type == 'vad' else model_name,
               version, batch, lr, opt, loss,
               str((config.n_mels if config.model_type != 'se' else 256,
                    config.n_frame)),
               chan, output] + data

        for suffix, default in (('', 'None'), ('_SWA', 'None'),
                                ('_sample', 'None')):
            ckpt = f'{os.path.splitext(path)[0]}{suffix}.h5'
            if os.path.exists(ckpt):
                if evaluation:
                    try:
                        # bundle= lets reference-era Keras HDF5 trios
                        # re-evaluate transparently (auto-detected)
                        variables = load_weights(ckpt, variables,
                                                 bundle=bundle)
                        score = evaluate(config, bundle, variables,
                                         overlap_hop=int(framelen) // 2,
                                         verbose=True)
                    except Exception:
                        continue
                else:
                    score = 1.0
                row += [np.mean(score)]
            else:
                row += [default]

        prev_lines.append(row)

    with open(result_path, 'w') as f:
        csv.writer(f).writerows(prev_lines)


if __name__ == '__main__':
    main()
