"""Complex-spectrogram <-> magnitude/phase transforms and the phase vocoder.

Parity targets (reference file:line):
* complex_to_magphase   transforms.py:111-123
* magphase_to_complex   transforms.py:126-134
* log_magphase          transforms.py:80-86
* minmax_norm_magphase  transforms.py:89-107
* phase_vocoder         transforms.py:137-195

All functions are pure jnp and jittable; channel layout follows the reference
convention ``[..., :chan] = first half (real or mag), [..., chan:] = second
half (imag or phase)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from challenge_tpu.ops.norms import EPSILON


def complex_to_magphase(complex_tensor, y=None):
    n_chan = complex_tensor.shape[-1] // 2
    real = complex_tensor[..., :n_chan]
    imag = complex_tensor[..., n_chan:]
    mag = jnp.sqrt(real * real + imag * imag)
    phase = jnp.arctan2(imag, real)
    magphase = jnp.concatenate([mag, phase], axis=-1)
    if y is None:
        return magphase
    return magphase, y


def magphase_to_complex(magphase):
    n_chan = magphase.shape[-1] // 2
    mag = magphase[..., :n_chan]
    phase = magphase[..., n_chan:]
    return jnp.concatenate([mag * jnp.cos(phase), mag * jnp.sin(phase)],
                           axis=-1)


def log_magphase(specs, labels=None, n_chan: int = 2):
    specs = jnp.concatenate(
        [jnp.log(specs[..., :n_chan] + EPSILON), specs[..., n_chan:]], axis=-1)
    if labels is not None:
        return specs, labels
    return specs


def minmax_norm_magphase(specs, labels=None):
    n_chan = specs.shape[-1] // 2
    mag = specs[..., :n_chan]
    phase = specs[..., n_chan:]
    axis = tuple(range(1, specs.ndim))

    mag_max = jnp.max(mag, axis=axis, keepdims=True)
    mag_min = jnp.min(mag, axis=axis, keepdims=True)
    phase_max = jnp.max(phase, axis=axis, keepdims=True)
    phase_min = jnp.min(phase, axis=axis, keepdims=True)

    specs = jnp.concatenate(
        [(mag - mag_min) / (mag_max - mag_min + EPSILON),
         (phase - phase_min) / (phase_max - phase_min + EPSILON)],
        axis=-1)
    if labels is not None:
        return specs, labels
    return specs


def phase_vocoder(complex_spec, rate: float = 1.0):
    """Time-stretch a complex spec by ``rate`` (reference: transforms.py:137-195).

    complex_spec: [freq, time, chan*2] with [..., :chan]=real, [..., chan:]=imag.
    Output time length is ceil(time / rate). ``rate`` is a static Python float.
    """
    if rate == 1:
        return complex_spec

    freq = complex_spec.shape[0]
    hop_length = freq - 1  # n_fft // 2
    n_chan = complex_spec.shape[-1] // 2

    def angle(spec):
        return jnp.arctan2(spec[..., n_chan:], spec[..., :n_chan])

    phase_advance = jnp.linspace(0., np.pi * hop_length, freq).reshape(-1, 1, 1)
    time_steps = jnp.arange(0, complex_spec.shape[1], rate,
                            dtype=complex_spec.dtype)

    spec = jnp.pad(complex_spec, [(0, 0), (0, 2), (0, 0)])
    spec_0 = jnp.take(spec, time_steps.astype(jnp.int32), axis=1)
    spec_1 = jnp.take(spec, time_steps.astype(jnp.int32) + 1, axis=1)

    angle_0 = angle(spec_0)
    angle_1 = angle(spec_1)

    def cnorm(s):
        # [freq, t, 2*chan] -> l2 norm over the (real, imag) pair per channel
        resh = s.reshape(freq, -1, 2, n_chan)
        return jnp.sqrt(jnp.sum(jnp.square(jnp.transpose(resh, (0, 1, 3, 2))),
                                axis=-1))

    norm_0 = cnorm(spec_0)
    norm_1 = cnorm(spec_1)

    phase_0 = angle(spec[:, :1, :])  # first frame angle
    phase = angle_1 - angle_0 - phase_advance
    phase = phase - 2 * np.pi * jnp.round(phase / (2 * np.pi))
    phase = phase + phase_advance
    phase = jnp.concatenate([phase_0, phase[:, :-1]], axis=1)
    phase_acc = jnp.cumsum(phase, axis=1)

    alphas = jnp.reshape(time_steps % 1.0, (1, -1, 1))
    mag = alphas * norm_1 + (1 - alphas) * norm_0

    real = mag * jnp.cos(phase_acc)
    imag = mag * jnp.sin(phase_acc)
    return jnp.concatenate([real, imag], axis=-1)
