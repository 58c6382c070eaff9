"""Interop with the reference's TensorFlow/Keras/torchaudio ecosystem.

* :mod:`refstubs` — sys.modules stubs for the reference's dependencies that
  are absent from this image (torchaudio, tensorflow_addons), faithful
  enough to import and run the reference's own source for differential
  tests and baseline timing.
* :mod:`keras_compat` — Keras-facing implementations of the reference's
  utils API (AdaBelief optimizer, apply_kernel_regularizer) for the root
  ``utils.py`` shim so the reference test-suite runs unmodified.
* :mod:`keras_h5` — Keras .h5 weight files in BOTH directions:
  :func:`load_keras_h5_variables` imports reference-trained checkpoints
  into flax param trees, and :func:`save_keras_h5_variables` exports flax
  trees as files the reference's own ``model.load_weights`` restores —
  models move freely between the two stacks.
* :mod:`aot` — serving artifacts: :func:`export_infer` serializes the
  inference forward (architecture + weights, symbolic batch dim) as
  versioned StableHLO via jax.export; :func:`load_infer` runs it with no
  model code or checkpoint present.
"""

from challenge_tpu.interop.aot import export_infer, load_infer  # noqa: F401
from challenge_tpu.interop.keras_h5 import (  # noqa: F401
    load_keras_h5_variables, save_keras_h5_variables)
