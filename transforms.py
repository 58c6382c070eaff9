"""Reference-API shim: ``transforms`` (reference: transforms.py).

Thin numpy/TF boundary over the challenge_tpu implementations so the
reference's transforms_test.py runs unmodified against this repo. Array math
delegates to :mod:`challenge_tpu.ops`; only the two stateful-TF-RNG
augmentations (``mask``, ``random_shift``) draw through ``tf.random`` —
their seeded golden tests (transforms_test.py:10-43) pin the exact global
RNG stream, which is only reachable by making the same draws in the same
order. The framework's own training path uses the key-based jax versions in
:mod:`challenge_tpu.ops.augment`.
"""

import numpy as np

from challenge_tpu.ops import complexspec as _cs
from challenge_tpu.ops import mel as _mel
from challenge_tpu.ops.norms import EPSILON, LOG_EPSILON  # noqa: F401


def _tf():
    import tensorflow as tf
    return tf


def mask(specs, axis, max_mask_size=None, n_mask=1):
    """SpecAugment masking (reference: transforms.py:12-40). Draws the
    size/offset pair per mask from TF's global RNG — same order and dtypes
    as the reference, so ``tf.random.set_seed`` goldens match — and applies
    the zero spans as one numpy product."""
    tf = _tf()
    specs = np.asarray(specs)
    total = specs.shape[axis]
    if max_mask_size is None:
        max_mask_size = total
    keep = np.ones(total, specs.dtype)
    for _ in range(n_mask):
        size = int(tf.random.uniform([], maxval=max_mask_size,
                                     dtype=tf.int32))
        offset = int(tf.random.uniform([], maxval=total - size,
                                       dtype=tf.int32))
        keep[offset:offset + size] = 0
    shape = [1] * specs.ndim
    shape[axis] = total
    return tf.convert_to_tensor(specs * keep.reshape(shape))


def random_shift(specs, axis=0, width=16):
    """Pad-then-random-crop (reference: transforms.py:43-47). The crop
    offset comes from ``tf.image.random_crop`` itself — the golden test
    (transforms_test.py:34-43) pins that op's exact draw from the seeded
    global stream."""
    tf = _tf()
    specs = tf.convert_to_tensor(specs)
    pads = [[width] * 2 if i == axis else [0] * 2
            for i in range(len(specs.shape))]
    return tf.image.random_crop(tf.pad(specs, pads), specs.shape)


def magphase_to_mel(num_mel_bins=80, num_spectrogram_bins=257,
                    sample_rate=16000, **kwargs):
    fn = _mel.magphase_to_mel(num_mel_bins, num_spectrogram_bins,
                              sample_rate, **kwargs)

    def convert(magphase, labels=None):
        out = fn(np.asarray(magphase, np.float32))
        out = _tf().convert_to_tensor(np.asarray(out))
        return out if labels is None else (out, labels)
    return convert


def log_magphase(specs, labels=None, n_chan=2):
    out = _cs.log_magphase(np.asarray(specs, np.float32), n_chan=n_chan)
    out = _tf().convert_to_tensor(np.asarray(out))
    return out if labels is None else (out, labels)


def minmax_norm_magphase(specs, labels=None):
    out = _cs.minmax_norm_magphase(np.asarray(specs, np.float32))
    out = _tf().convert_to_tensor(np.asarray(out))
    return out if labels is None else (out, labels)


def complex_to_magphase(complex_tensor, y=None):
    out = _cs.complex_to_magphase(np.asarray(complex_tensor, np.float32))
    out = _tf().convert_to_tensor(np.asarray(out))
    return out if y is None else (out, y)


def magphase_to_complex(magphase):
    return _tf().convert_to_tensor(
        np.asarray(_cs.magphase_to_complex(np.asarray(magphase, np.float32))))


def phase_vocoder(complex_spec, rate=1.0):
    """Time-stretch (reference: transforms.py:137-195); rate 1 returns the
    input unchanged, like the reference's early-out."""
    if rate == 1.0:
        return complex_spec
    out = _cs.phase_vocoder(np.asarray(complex_spec, np.float32), rate=rate)
    return _tf().convert_to_tensor(np.asarray(out))
