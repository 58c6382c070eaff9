"""Reference-API shim: ``swa`` (reference: swa.py).

The SWA callback (running average of all weights from ``start_epoch`` every
``swa_freq`` epochs, set-on-train-end without BN re-estimation — the
reference's "Please Reset BN" behavior is deliberately preserved) and the
``NO_SWA_ERROR`` sentinel raised when SWA never triggered.
"""

from challenge_tpu.train.callbacks import NO_SWA_ERROR, SWA  # noqa: F401
