#!/usr/bin/env python
"""Entry-point shim: ``python trainer.py --name <run> ...``
(reference signature preserved; implementation in challenge_tpu.cli.trainer).
"""
from challenge_tpu.cli.trainer import main, make_dataset  # noqa: F401
from challenge_tpu.data.labels import preprocess_labels, to_density_labels  # noqa: F401
from challenge_tpu.ops.norms import minmax_log_on_mel  # noqa: F401
from challenge_tpu.train.losses import density_loss as custom_loss  # noqa: F401
from challenge_tpu.train.optim import custom_scheduler  # noqa: F401

if __name__ == '__main__':
    main()
