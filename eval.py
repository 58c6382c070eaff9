#!/usr/bin/env python
"""Entry-point shim: ``python eval.py --name <run> [--p]``
(reference signature preserved; implementation in challenge_tpu.cli.eval)."""
from challenge_tpu.cli.eval import main  # noqa: F401
from challenge_tpu.evaluate import (  # noqa: F401
    Challenge_Metric, evaluate, get_er, output_to_metric, second2frame)
from challenge_tpu.ops.norms import minmax_log_on_mel  # noqa: F401

if __name__ == '__main__':
    main()
