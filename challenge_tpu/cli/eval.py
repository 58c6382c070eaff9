"""Inference/eval entry (reference: eval.py:42-65).

    python -m challenge_tpu.cli.eval --name <run> [--p] [--path DIR]

``--p`` parses hyperparameters back out of the run name (the run-name
grammar is de-facto API — reference: eval.py:48-60).
"""

from __future__ import annotations

import os

import jax

from challenge_tpu.config import config_from_args, parse_run_name
from challenge_tpu.evaluate import evaluate
from challenge_tpu.models import get_model
from challenge_tpu.train import load_weights


def main(argv=None):
    config = config_from_args(argv, extra={
        '--verbose': dict(help='verbose', type=bool, default=True),
        '--p': dict(help='parsing name', action='store_true'),
        '--path': dict(type=str, default=''),
    })
    extra = config.extra_args
    if extra.get('p'):
        config = parse_run_name(config, config.name)

    bundle = get_model(config)
    variables = bundle.init(jax.random.PRNGKey(config.seed))
    variables = load_weights(
        os.path.join(extra.get('path', ''), f'{config.name}.h5'), variables,
        bundle=bundle)   # Keras HDF5 checkpoints import transparently
    return evaluate(config, bundle, variables,
                    verbose=extra.get('verbose', True))


if __name__ == '__main__':
    main()
