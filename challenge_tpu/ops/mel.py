"""Mel filterbank projection as a GEMM.

Parity target: ``tf.signal.linear_to_mel_weight_matrix(n_mels, 257, 16000)``
with TF's default band edges (lower 125 Hz, upper 3800 Hz) as used by the
reference (transforms.py:51-56), and the ``magphase_to_mel`` map
(transforms.py:58-77) that drops the phase half and tensordots the magnitude
channels with the mel matrix.

On TPU the [freq=257] x [257, n_mels] contraction is a single MXU GEMM that
XLA fuses with the surrounding elementwise chain (sqrt/log/minmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hertz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


@functools.lru_cache(maxsize=16)
def linear_to_mel_weight_matrix(num_mel_bins: int = 80,
                                num_spectrogram_bins: int = 257,
                                sample_rate: int = 16000,
                                lower_edge_hertz: float = 125.0,
                                upper_edge_hertz: float = 3800.0):
    """NumPy reimplementation of tf.signal.linear_to_mel_weight_matrix.

    Returns float32 [num_spectrogram_bins, num_mel_bins]. The first (DC) row
    is zero, matching TF's ``bands_to_zero = 1`` behavior.
    """
    # float32 intermediates to track TF's in-graph f32 arithmetic
    bands_to_zero = 1
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins,
                               dtype=np.float32)[bands_to_zero:]
    spectrogram_bins_mel = _hertz_to_mel(linear_freqs).astype(np.float32)[:, None]

    edges = np.linspace(np.float32(_hertz_to_mel(lower_edge_hertz)),
                        np.float32(_hertz_to_mel(upper_edge_hertz)),
                        num_mel_bins + 2, dtype=np.float32)
    lower_edge_mel = edges[None, :num_mel_bins]
    center_mel = edges[None, 1:num_mel_bins + 1]
    upper_edge_mel = edges[None, 2:]

    lower_slopes = (spectrogram_bins_mel - lower_edge_mel) / (
        center_mel - lower_edge_mel)
    upper_slopes = (upper_edge_mel - spectrogram_bins_mel) / (
        upper_edge_mel - center_mel)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    weights = np.pad(weights, [[bands_to_zero, 0], [0, 0]])
    return weights.astype(np.float32)


def mel_filterbank(num_mel_bins: int = 80, num_spectrogram_bins: int = 257,
                   sample_rate: int = 16000, **kwargs):
    return jnp.asarray(linear_to_mel_weight_matrix(
        num_mel_bins, num_spectrogram_bins, sample_rate, **kwargs))


def magphase_to_mel(num_mel_bins: int = 80, num_spectrogram_bins: int = 257,
                    sample_rate: int = 16000, **kwargs):
    """Returns a closure mapping magphase -> mel (reference: transforms.py:51-77).

    x: ``[batch, freq, time, chan*2]`` or ``[freq, time, chan*2]`` magphase;
    output: ``[batch, n_mels, time, chan]`` (or unbatched), phase half dropped.
    """
    mel_matrix = mel_filterbank(num_mel_bins, num_spectrogram_bins,
                                sample_rate, **kwargs)

    def _magphase_to_mel(x, y=None):
        x = x[..., :x.shape[-1] // 2]  # drop phase channels
        if x.ndim == 4:
            out = jnp.einsum('bftc,fm->bmtc', x, mel_matrix,
                             precision=jax.lax.Precision.HIGHEST)
        elif x.ndim == 3:
            out = jnp.einsum('ftc,fm->mtc', x, mel_matrix,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            raise ValueError('x.ndim must be 3 or 4')
        if y is None:
            return out
        return out, y
    return _magphase_to_mel
