"""Interop with the reference's TensorFlow/Keras/torchaudio ecosystem.

* :mod:`refstubs` — sys.modules stubs for the reference's dependencies that
  are absent from this image (torchaudio, tensorflow_addons), faithful
  enough to import and run the reference's own source for differential
  tests and baseline timing.
* :mod:`keras_compat` — Keras-facing implementations of the reference's
  utils API (AdaBelief optimizer, apply_kernel_regularizer) for the root
  ``utils.py`` shim so the reference test-suite runs unmodified.
* :mod:`keras_h5` — Keras .h5 weight-file import into flax param trees, so
  reference-trained checkpoints evaluate in this framework.
"""
