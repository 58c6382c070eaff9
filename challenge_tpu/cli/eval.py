"""Inference/eval entry (reference: eval.py:42-65).

    python -m challenge_tpu.cli.eval --name <run> [--p] [--path DIR]

``--p`` parses hyperparameters back out of the run name (the run-name
grammar is de-facto API — reference: eval.py:48-60).

``--export_aot PATH`` additionally writes the loaded model (any
checkpoint this entry can read — including the reference's own Keras
.h5) as a self-contained StableHLO serving artifact (interop/aot.py):
one command from a reference-trained checkpoint to a deployable TPU
program. ``--export_aot_eval PATH`` exports the WHOLE eval chain instead
(raw PCM -> thresholded frame grids, reference metrics.py:42-81).
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
        '--export_aot': dict(type=str, default='',
                             help='also write a jax.export serving '
                                  'artifact to this path'),
        '--export_aot_eval': dict(type=str, default='',
                                  help='also write the WHOLE eval chain '
                                       '(PCM -> thresholded frame grids) '
                                       'as a jax.export artifact, sized '
                                       'to the cwd wav corpus'),
    })
    extra = config.extra_args
    if extra.get('p'):
        config = parse_run_name(config, config.name)

    bundle = get_model(config)
    variables = bundle.init(jax.random.PRNGKey(config.seed))
    variables = load_weights(
        os.path.join(extra.get('path', ''), f'{config.name}.h5'), variables,
        bundle=bundle)   # Keras HDF5 checkpoints import transparently
    if extra.get('export_aot'):
        from challenge_tpu.interop.aot import export_infer
        export_infer(bundle, variables, path=extra['export_aot'])
        print(f'wrote serving artifact: {extra["export_aot"]}')
    if extra.get('export_aot_eval'):
        from glob import glob
        from challenge_tpu.evaluate.infer import _wav_headers
        from challenge_tpu.interop.aot import export_eval
        paths = sorted(glob('*.wav'))
        if not paths:
            raise ValueError(
                '--export_aot_eval sizes the program from the wav corpus '
                'in the CURRENT directory, and there are no *.wav files '
                f'here ({os.getcwd()})')
        hdr = _wav_headers(paths)
        if hdr is None:
            raise ValueError(
                '--export_aot_eval needs a uniform wav corpus '
                '(16-bit PCM, one shared sample rate and channel count) '
                f'— the {len(paths)} *.wav files here are mixed-format')
        lens, chan = hdr
        export_eval(bundle, variables, s_max=int(lens.max()),
                    wav_channels=chan, path=extra['export_aot_eval'])
        print(f'wrote eval-chain artifact: {extra["export_aot_eval"]}')
    return evaluate(config, bundle, variables,
                    verbose=extra.get('verbose', True))


if __name__ == '__main__':
    main()
