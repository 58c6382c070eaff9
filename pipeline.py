"""Reference-API shim: ``pipeline`` (reference: pipeline.py).

``merge_complex_specs`` and ``make_pipeline`` with the reference's
signatures (implicit RNG, ragged host lists in, TF-tensor samples out) over
the challenge_tpu on-device implementations, so the reference's
pipeline_test.py runs unmodified. The framework's own training path uses
the explicit-key batched versions in :mod:`challenge_tpu.data`.
"""

import numpy as np

import jax
from challenge_tpu.data import mixture as _mixture
from challenge_tpu.data import pipeline as _pipeline

AUTOTUNE = -1   # reference re-exports tf.data AUTOTUNE (transforms.py:6)

_KEY = [jax.random.PRNGKey(np.random.SeedSequence().generate_state(1)[0])]


def _next_key():
    """Stateful key stream standing in for TF's global RNG (the reference
    draws implicitly; no test seeds this path — only shapes are pinned)."""
    _KEY[0], k = jax.random.split(_KEY[0])
    return k


def _tf_pair(spec, label):
    import tensorflow as tf
    if isinstance(label, tuple):
        label = tuple(tf.convert_to_tensor(np.asarray(v)) for v in label)
    else:
        label = tf.convert_to_tensor(np.asarray(label))
    return tf.convert_to_tensor(np.asarray(spec)), label


def merge_complex_specs(background,
                        voices_and_labels,
                        noises=None,
                        n_frame=300,
                        n_classes=3,
                        t_axis=1,
                        min_ratio=2/3,
                        min_noise_ratio=1/2,
                        snr=-20,
                        seperate_noise_voice=False):
    """Single-sample synthesis (reference: pipeline.py:6-110)."""
    if t_axis != 1:
        raise NotImplementedError('reference always synthesizes with t_axis=1')
    voices, labels = voices_and_labels
    spec, label = _mixture.merge_complex_specs(
        _next_key(),
        np.asarray(background, np.float32),
        (np.asarray(voices, np.float32), np.asarray(labels, np.float32)),
        None if noises is None else np.asarray(noises, np.float32),
        n_frame=n_frame, n_classes=n_classes, min_ratio=min_ratio,
        min_noise_ratio=min_noise_ratio, snr=snr,
        seperate_noise_voice=seperate_noise_voice)
    return _tf_pair(spec, label)


class _TFPipeline:
    """Reference-shaped dataset facade: an infinite iterable of single
    (complex_spec, labels) TF-tensor samples with ``.take(n)`` — the surface
    the reference's tf.data.Dataset exposes to its tests and map chains."""

    def __init__(self, raw):
        self._raw = raw

    def __iter__(self):
        for spec, label in self._raw:
            yield _tf_pair(spec, label)

    def take(self, n):
        it = iter(self)
        return [next(it) for _ in range(n)]


def make_pipeline(backgrounds,
                  voices,
                  labels,
                  noises=None,
                  n_frame=300,
                  max_voices=10,
                  max_noises=10,
                  n_classes=3,
                  **kwargs):
    """Dataset assembly (reference: pipeline.py:113-175)."""
    raw = _pipeline.make_pipeline(
        backgrounds, voices, labels, noises, n_frame=n_frame,
        max_voices=max_voices, max_noises=max_noises, n_classes=n_classes,
        seed=int(np.random.SeedSequence().generate_state(1)[0]), **kwargs)
    return _TFPipeline(raw)
