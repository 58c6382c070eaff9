"""Waveform ingest: WAV reading, Kaldi-style resampling, STFT as GEMM.

Capability parity with the reference WAV frontend (reference:
data_utils.py:9-34): load -> resample to 16 kHz (the reference delegates to
``torchaudio.compliance.kaldi.resample_waveform``) -> RMS/10 normalize ->
complex STFT with n_fft=512, hop=256 (``torchaudio.transforms.Spectrogram``)
-> layout ``[freq, time, chan*2]`` with real||imag concatenated on the last
axis.

TPU-native design notes
-----------------------
* The DFT is phrased as two GEMMs (frames @ cos, frames @ -sin) instead of an
  FFT: a 512-point transform is a (T, 512) x (512, 257) matmul, which maps
  directly onto the MXU and fuses with the downstream mel GEMM. At these sizes
  the O(n^2) matmul beats a poorly-tiled FFT on TPU and keeps the whole
  frontend inside one XLA program.
* Resampling is a polyphase windowed-sinc built host-side once per rate pair
  and applied as a single gather + GEMM, numerically matching Kaldi's
  LinearResample (the algorithm behind torchaudio.compliance.kaldi.
  resample_waveform: lowpass cutoff 0.99 * min(sr)/2, Hann-windowed sinc with
  6 zero crossings).
"""

from __future__ import annotations

import functools
import math
import wave

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- wav io
def read_wav(path: str):
    """Read a PCM WAV file -> (float32 [chan, samples] in [-1, 1], rate)."""
    with wave.open(path, 'rb') as f:
        n_chan = f.getnchannels()
        rate = f.getframerate()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype='<i2').astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype='<i4').astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f'unsupported sample width: {width}')
    return data.reshape(-1, n_chan).T, rate


# ---------------------------------------------------------------- resampling
@functools.lru_cache(maxsize=32)
def resample_matrix(orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6):
    """Polyphase weights of Kaldi's LinearResample (numpy, cached).

    Returns (first_indices [P], weights [P, W], input_unit, output_unit)
    with input_unit = orig_freq/gcd, output_unit = P = new_freq/gcd (the
    number of output phases per input unit); output sample ``i`` with phase
    ``p = i % P`` and unit ``u = i // P`` is
    ``sum_k weights[p, k] * x[first_indices[p] + u * input_unit + k]``.
    """
    assert orig_freq > 0 and new_freq > 0
    min_freq = min(orig_freq, new_freq)
    lowpass_cutoff = 0.99 * 0.5 * min_freq
    window_width = lowpass_filter_width / (2.0 * lowpass_cutoff)

    g = math.gcd(orig_freq, new_freq)
    input_unit = orig_freq // g
    output_unit = new_freq // g

    output_t = np.arange(output_unit, dtype=np.float64) / new_freq
    min_t = output_t - window_width
    max_t = output_t + window_width
    min_input_index = np.ceil(min_t * orig_freq)
    max_input_index = np.floor(max_t * orig_freq)
    num_indices = (max_input_index - min_input_index + 1).astype(np.int64)
    w = int(num_indices.max())

    j = np.arange(w, dtype=np.float64)[None, :]
    input_index = min_input_index[:, None] + j
    delta_t = input_index / orig_freq - output_t[:, None]

    weights = np.zeros_like(delta_t)
    inside = np.abs(delta_t) < window_width
    weights[inside] = 0.5 * (1 + np.cos(
        2 * np.pi * lowpass_cutoff / lowpass_filter_width * delta_t[inside]))
    nz = delta_t != 0.0
    weights[nz] *= np.sin(2 * np.pi * lowpass_cutoff * delta_t[nz]) / (
        np.pi * delta_t[nz])
    weights[~nz] *= 2 * lowpass_cutoff
    weights /= orig_freq
    # zero out columns beyond each phase's own index count
    weights *= (j < num_indices[:, None])
    return (min_input_index.astype(np.int64), weights.astype(np.float32),
            input_unit, output_unit)


def resample_waveform(wav, orig_freq: int, new_freq: int,
                      lowpass_filter_width: int = 6):
    """Resample [chan, samples] via polyphase gather + GEMM (jit-friendly).

    Numerically matches Kaldi LinearResample / the reference's torchaudio call
    (reference: data_utils.py:20-21). Output length matches Kaldi's
    ``ceil(samples * new / orig)`` convention.
    """
    first_idx, weights, in_unit, out_unit = resample_matrix(
        orig_freq, new_freq, lowpass_filter_width)
    wav = jnp.asarray(wav, jnp.float32)
    n_in = wav.shape[-1]
    # Kaldi: number of output samples covering the input duration.
    n_out = int(np.ceil(n_in * new_freq / orig_freq))

    if in_unit == 1 and out_unit == 1:
        # Equal rates: the polyphase collapses to ONE phase — still NOT the
        # identity (Kaldi lowpasses at 0.99 * nyquist even when
        # orig == new, and the reference resamples unconditionally,
        # data_utils.py:20-21). out[u] = sum_k w[k] * x[first + u + k] is a
        # W-tap FIR, phrased as W static shifted adds instead of the
        # [n, 1, W] gather below (which materializes W copies of the
        # waveform — ~100 MB for a 60 s clip). Out-of-range taps read the
        # zero padding, exactly reproducing the gather path's valid mask.
        first = int(first_idx[0])
        w_taps = weights.shape[1]
        lpad = max(0, -first)
        rpad = max(0, first + w_taps - 1 + (n_out - 1) - (n_in - 1))
        xp = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(lpad, rpad)])
        out = jnp.zeros(wav.shape[:-1] + (n_out,), jnp.float32)
        for k in range(w_taps):
            out = out + weights[0, k] * jax.lax.slice_in_dim(
                xp, lpad + first + k, lpad + first + k + n_out, axis=-1)
        return out

    n_units = -(-n_out // out_unit)  # ceil

    P, W = weights.shape
    # index grid [n_units, P, W] built on device (iota, not a baked
    # constant — a minute of audio would otherwise embed ~10M int64s
    # into the compiled program)
    units = jnp.arange(n_units, dtype=jnp.int32) * in_unit
    idx = (units[:, None, None] + jnp.asarray(first_idx, jnp.int32)[None, :, None]
           + jnp.arange(W, dtype=jnp.int32)[None, None, :])
    valid = (idx >= 0) & (idx < n_in)
    idx_clip = jnp.clip(idx, 0, max(n_in - 1, 0))

    gathered = wav[..., idx_clip] * valid  # [chan, n_units, P, W]
    out = jnp.einsum('...upw,pw->...up', gathered, jnp.asarray(weights))
    out = out.reshape(*wav.shape[:-1], n_units * P)
    return out[..., :n_out]


# ---------------------------------------------------------------------- stft
@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real-DFT basis, windowed: returns [n_fft, n_fft//2+1] cos and -sin."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)  # periodic hann
    cos_m = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def _frame(x, frame_length: int, hop: int, center: bool = True):
    """[..., samples] -> [..., n_frames, frame_length] with reflect padding."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(frame_length // 2, frame_length // 2)]
        x = jnp.pad(x, pad, mode='reflect')
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop
    starts = jnp.arange(n_frames, dtype=jnp.int32) * hop
    idx = starts[:, None] + jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    return x[..., idx]  # gather -> [..., n_frames, frame_length]


@functools.partial(jax.jit, static_argnames=('n_fft', 'hop', 'center'))
def stft(wav, n_fft: int = 512, hop: int = 256, center: bool = True):
    """Complex STFT as two MXU GEMMs.

    wav: [..., samples] -> (real, imag) each [..., freq, n_frames] matching
    torch.stft(n_fft, hop, window=hann, center=True, pad_mode='reflect') as
    used by the reference's torchaudio Spectrogram (data_utils.py:17).
    """
    cos_m, sin_m = _dft_matrices(n_fft)
    frames = _frame(wav, n_fft, hop, center)  # [..., T, n_fft]
    real = jnp.matmul(frames, cos_m, precision=jax.lax.Precision.HIGHEST)
    imag = jnp.matmul(frames, sin_m, precision=jax.lax.Precision.HIGHEST)
    # -> [..., freq, T]
    return jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2)


def stft_magnitude(wav, n_fft: int = 512, hop: int = 256):
    real, imag = stft(wav, n_fft, hop)
    return jnp.sqrt(real * real + imag * imag)


# ----------------------------------------------------------------- load_wav
def rms_normalize(wav):
    """wav / (10 * rms(wav)) (reference: data_utils.py:32-34)."""
    rms = jnp.sqrt(jnp.mean(jnp.square(wav))) * 10.0
    return wav / rms


@functools.partial(jax.jit, static_argnames=('rate', 'sr', 'n_fft', 'hop'))
def wav_to_spec(wav, rate: int, sr: int = 16000, n_fft: int = 512,
                hop: int = 256):
    """The full device-side ingest chain in ONE jitted program:
    resample -> RMS/10 normalize -> STFT -> reference layout
    ``[freq, time, chan*2]`` (real||imag). One compile per (rate, length)."""
    if wav.dtype == jnp.int16:
        wav = wav.astype(jnp.float32) / 32768.0
    wav = resample_waveform(wav, rate, sr)
    wav = rms_normalize(wav)
    real, imag = stft(wav, n_fft, hop)           # [chan, freq, T] each
    # The reference takes torchaudio's [chan, freq, time, (re,im)] and permutes
    # to [freq, time, (re,im), chan] before flattening the trailing two axes
    # (data_utils.py:25-27), so the last axis is real-for-all-channels followed
    # by imag-for-all-channels: [..., :chan]=real, [..., chan:]=imag.
    spec = jnp.stack([real, imag], axis=0)       # [2, chan, freq, T]
    spec = jnp.transpose(spec, (2, 3, 0, 1))     # [freq, T, 2, chan]
    return spec.reshape(*spec.shape[:2], -1)


def read_wav_raw(path: str):
    """Read a 16-bit PCM WAV without converting to float: (int16
    [chan, samples], rate). Returns None for other sample widths (callers
    fall back to :func:`read_wav`). Shipping int16 to the device halves the
    host->device transfer — the dominant eval-path cost on remote-attached
    TPUs — and dividing by 32768 on device is bit-identical to the host
    conversion."""
    with wave.open(path, 'rb') as f:
        if f.getsampwidth() != 2:
            return None, f.getframerate()
        n_chan = f.getnchannels()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    data = np.frombuffer(raw, dtype='<i2').reshape(-1, n_chan)
    return np.ascontiguousarray(data.T), rate


def load_wav_device(wav_fname: str, sr: int = 16000, n_fft: int = 512,
                    hop: int = 256):
    """WAV file -> on-device complex spectrogram (no host round-trip).

    16-bit PCM (the common case) is transferred as int16 and converted on
    device; other widths decode to float32 on host."""
    raw, rate = read_wav_raw(wav_fname)
    if raw is not None:
        return wav_to_spec(jnp.asarray(raw), rate, sr, n_fft, hop)
    wav, rate = read_wav(wav_fname)
    return wav_to_spec(jnp.asarray(wav), rate, sr, n_fft, hop)


def load_wav(wav_fname: str, sr: int = 16000, n_fft: int = 512,
             hop: int = 256):
    """WAV file -> complex spectrogram ``[freq, time, chan*2]`` as numpy
    (reference API parity — data_utils.py:9-29)."""
    return np.asarray(load_wav_device(wav_fname, sr, n_fft, hop))
