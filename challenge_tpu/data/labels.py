"""Per-example label and channel maps (reference: data_utils.py:58-148,
trainer.py:86-104)."""

from __future__ import annotations

import jax.numpy as jnp

from challenge_tpu.models.layers import avg_pool_same
from challenge_tpu.ops.norms import safe_div


def to_frame_labels(x, y):
    """[..., n_voices, n_frames, n_classes] -> [..., n_frames, n_classes]
    (reference: data_utils.py:64-70)."""
    return x, jnp.sum(y, axis=-3)


def to_density_labels(x, y):
    """Normalize each voice's label mass to 1, then sum over voices
    (reference: trainer.py:97-104)."""
    y = safe_div(y, jnp.sum(y, axis=(-2, -1), keepdims=True))
    return x, jnp.sum(y, axis=-3)


def mono_chan(x, y=None):
    """Stereo -> mono sum (complex halves summed pairwise; reference:
    data_utils.py:73-76). Reference quirk preserved: called WITHOUT labels it
    is an identity (the eval path relies on this — metrics.py:42-43 never
    actually downmixes)."""
    if y is not None:
        return x[..., :1] + x[..., 1:], y
    return x


def stereo_mono(x, y=None):
    """2ch -> 3ch stereo+mono concat for complex specs (reference:
    data_utils.py:79-82)."""
    out = jnp.concatenate(
        [x[..., :2], x[..., :1] + x[..., 1:2],
         x[..., 2:4], x[..., 2:3] + x[..., 3:4]], -1)
    if y is not None:
        return out, y
    return out


def _avg_pool_1d_same(y, pool: int, stride: int):
    """Keras AveragePooling1D(pool, stride, 'same') on [..., T, C] — the
    shared count-correct pooling from models.layers."""
    return avg_pool_same(y, (pool,), (stride,))


def label_downsample(resolution: int = 32):
    """Avg-pool x``resolution`` then threshold 0.5 (reference:
    data_utils.py:85-97). Deliberate deviation: the reference's stray
    ``[:resolution]`` slice on the BATCH axis (data_utils.py:90,94) is
    dropped — it is a no-op at the reference's batch 12 but silently
    truncates batches larger than ``resolution``, which TPU-scale batches
    hit immediately."""
    def _label_downsample(x, y):
        if isinstance(y, (list, tuple)):
            y_ = _avg_pool_1d_same(y[0], resolution, resolution)
            y = ((y_ >= 0.5).astype(y_.dtype),) + tuple(y[1:])
        else:
            y = _avg_pool_1d_same(y, resolution, resolution)
            y = (y >= 0.5).astype(y.dtype)
        return x, y
    return _label_downsample


def preprocess_labels(multiplier):
    """5x sum-pool-by-2 (= sum-pool x32) then scale (reference:
    trainer.py:86-94)."""
    def _preprocess(x, y):
        for _ in range(5):
            y = _avg_pool_1d_same(y, 2, 2) * 2
        return x, y * multiplier
    return _preprocess


def multiply_label(multiply_factor):
    """Scale labels for MSE-style training (reference: data_utils.py:120-123)."""
    def _multiply_label(x, y):
        return x, y * multiply_factor
    return _multiply_label


def speech_enhancement_preprocess(x, y=None):
    """Drop the DC row + keep the real half; targets become
    (frame_labels, only_voice', only_noise') (reference: data_utils.py:139-148,
    including the quirk that the voice/noise targets keep only channel 0 —
    the second slice uses the already-halved channel count)."""
    x = x[..., 1:, :, :x.shape[-1] // 2]
    if y is None:
        return x
    half = x.shape[-1] // 2  # note: half of the already-halved count
    y = (jnp.sum(y[0], axis=-3),
         y[1][..., 1:, :, :half],
         y[2][..., 1:, :, :half])
    return x, y
