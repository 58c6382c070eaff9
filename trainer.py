#!/usr/bin/env python
"""Entry-point shim: ``python trainer.py --name <run> ...``
(reference signature preserved; implementation in challenge_tpu.cli.trainer).
"""
from challenge_tpu.cli.trainer import main, make_dataset  # noqa: F401
from challenge_tpu.data.labels import preprocess_labels, to_density_labels  # noqa: F401
from challenge_tpu.ops.norms import minmax_log_on_mel  # noqa: F401
from challenge_tpu.train.losses import density_loss as custom_loss  # noqa: F401
from challenge_tpu.train.optim import custom_scheduler  # noqa: F401
# the reference duplicates these two in trainer.py (trainer.py:80-83 ==
# data_utils.py:58-61; trainer.py:192-198 is metrics.py:277-287 at C=30 —
# the formula is class-count-agnostic); one implementation serves both names
from data_utils import augment  # noqa: F401
from challenge_tpu.train.metrics import cos_sim  # noqa: F401

if __name__ == '__main__':
    main()
