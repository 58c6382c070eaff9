"""Reference-API shim: ``data_utils`` (reference: data_utils.py).

WAV ingest and the per-example/batch preprocessing maps under the
reference's names, delegating to the challenge_tpu jitted implementations.
``augment`` composes the TF-RNG ``mask`` from the root ``transforms`` shim
(so its global-seed behavior matches the reference); the framework's own
training path uses the key-based :func:`challenge_tpu.ops.augment.specaugment`.
"""

import numpy as np

from challenge_tpu.data.labels import (  # noqa: F401
    label_downsample, mono_chan, multiply_label,
    speech_enhancement_preprocess, stereo_mono, to_frame_labels)
from challenge_tpu.ops import augment as _aug
from challenge_tpu.ops.augment import stft_filter  # noqa: F401
from challenge_tpu.ops.dsp import load_wav, rms_normalize as normalize  # noqa: F401
from challenge_tpu.ops.norms import EPSILON, log_on_mel, minmax  # noqa: F401
from challenge_tpu.ops.norms import safe_div  # noqa: F401

from transforms import mask as _tf_mask


def augment(specs, labels, time_axis=-2, freq_axis=-3):
    """SpecAugment time+freq masking (reference: data_utils.py:58-61)."""
    specs = _tf_mask(specs, axis=time_axis, max_mask_size=24, n_mask=6)
    specs = _tf_mask(specs, axis=freq_axis, max_mask_size=16)
    return specs, labels


def random_merge_aug(number):
    """Random convex-combination channel augmentation
    (reference: data_utils.py:100-117) with the reference's implicit-RNG
    signature (the framework's key-based version is
    challenge_tpu.ops.augment.random_merge_aug)."""
    import pipeline as _pipeline_shim
    inner = _aug.random_merge_aug(number)

    def _random_merge_aug(x, y=None):
        out = inner(_pipeline_shim._next_key(), np.asarray(x, np.float32))
        return out if y is None else (out, y)
    return _random_merge_aug
