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

import jax
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
    """Time-stretch a complex spec by ``rate`` without changing pitch
    (capability parity: reference transforms.py:137-195, itself a port of
    torchaudio's phase vocoder).

    complex_spec: [freq, time, chan*2] with [..., :chan]=real,
    [..., chan:]=imag. Output time length is ceil(time / rate); ``rate`` is
    a static Python float. Implemented on complex64: resample the frame
    grid at ``rate``, interpolate magnitudes linearly, and integrate the
    wrapped phase increments so phase stays coherent across frames.
    """
    if rate == 1:
        return complex_spec

    freq, t, _ = complex_spec.shape
    half = complex_spec.shape[-1] // 2
    z = jax.lax.complex(complex_spec[..., :half], complex_spec[..., half:])

    # expected per-frame phase advance of bin k at hop n_fft//2 = freq - 1
    advance = jnp.linspace(0.0, np.pi * (freq - 1), freq)[:, None, None]
    steps = jnp.arange(0, t, rate, dtype=jnp.float32)
    z = jnp.pad(z, [(0, 0), (0, 2), (0, 0)])
    lo = jnp.take(z, steps.astype(jnp.int32), axis=1)
    hi = jnp.take(z, steps.astype(jnp.int32) + 1, axis=1)

    frac = (steps % 1.0)[None, :, None]
    mag = frac * jnp.abs(hi) + (1 - frac) * jnp.abs(lo)

    # wrapped instantaneous phase increment, re-centered on the advance
    dphi = jnp.angle(hi) - jnp.angle(lo) - advance
    dphi = dphi - 2 * np.pi * jnp.round(dphi / (2 * np.pi)) + advance
    phi = jnp.cumsum(
        jnp.concatenate([jnp.angle(z[:, :1]), dphi[:, :-1]], axis=1), axis=1)

    out = mag * jnp.exp(1j * phi.astype(jnp.complex64))
    return jnp.concatenate([jnp.real(out), jnp.imag(out)], axis=-1)
