#!/usr/bin/env python
"""Entry-point shim: ``python sj_train.py --model_type vad --v 8 ...``
(reference signature preserved; implementation in challenge_tpu.cli.sj_train).
"""
from challenge_tpu.cli.sj_train import main, make_banks, make_dataset  # noqa: F401
from challenge_tpu.config import Config, build_argparser  # noqa: F401
from challenge_tpu.models import get_model  # noqa: F401
from challenge_tpu.train.optim import adaptive_clip_grad, custom_scheduler  # noqa: F401

if __name__ == '__main__':
    main()
