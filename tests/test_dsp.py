"""DSP frontend tests: STFT-as-GEMM vs torch.stft, Kaldi resampler sanity,
full load_wav chain (reference: data_utils.py:9-34)."""

import wave

import numpy as np
import pytest

from challenge_tpu.ops import (
    load_wav, read_wav, resample_waveform, rms_normalize, stft,
)


def _write_wav(path, data, rate, n_chan=1):
    """data: float [-1, 1], shape [chan, samples]."""
    pcm = (np.clip(data, -1, 1) * 32767).astype('<i2')
    with wave.open(str(path), 'wb') as f:
        f.setnchannels(n_chan)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.T.tobytes())


class TestStft:
    def test_matches_torch_stft(self):
        torch = pytest.importorskip('torch')
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4000).astype(np.float32)
        real, imag = stft(x, 512, 256)
        t = torch.stft(torch.tensor(x), n_fft=512, hop_length=256,
                       window=torch.hann_window(512, periodic=True),
                       center=True, pad_mode='reflect', return_complex=True)
        np.testing.assert_allclose(np.asarray(real), t.real.numpy(),
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(imag), t.imag.numpy(),
                                   atol=2e-3, rtol=1e-4)

    def test_shapes(self):
        x = np.zeros((3, 16000), np.float32)
        real, imag = stft(x, 512, 256)
        assert real.shape == (3, 257, 16000 // 256 + 1)
        assert imag.shape == real.shape

    def test_pure_tone_bin(self):
        sr, n_fft, hop = 16000, 512, 256
        f = 1000.0  # exactly bin 32 (1000/31.25)
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
        real, imag = stft(x, n_fft, hop)
        mag = np.asarray(np.sqrt(real**2 + imag**2))[0]
        peak_bins = mag[:, 5:-5].argmax(axis=0)
        assert (peak_bins == 32).all()


def naive_linear_resample(x, orig_freq, new_freq, width=6):
    """Independent direct-sum implementation of Kaldi's LinearResample (the
    algorithm behind torchaudio.compliance.kaldi.resample_waveform, reference:
    data_utils.py:20-21), written straight from the math: for each output
    time t, sum input samples within the windowed-sinc support, weighting by
    a Hann-windowed ideal-lowpass kernel at cutoff 0.99 * min(sr) / 2.
    O(N*W) float64 — the oracle for the vectorized polyphase-GEMM version."""
    min_freq = min(orig_freq, new_freq)
    cutoff = 0.99 * 0.5 * min_freq
    half_width = width / (2.0 * cutoff)
    n_in = len(x)
    n_out = int(np.ceil(n_in * new_freq / orig_freq))
    out = np.zeros(n_out, dtype=np.float64)
    for i in range(n_out):
        t = i / new_freq
        j_lo = max(int(np.ceil((t - half_width) * orig_freq)), 0)
        j_hi = min(int(np.floor((t + half_width) * orig_freq)), n_in - 1)
        j = np.arange(j_lo, j_hi + 1)
        delta = j / orig_freq - t
        hann = np.where(np.abs(delta) < half_width,
                        0.5 * (1 + np.cos(2 * np.pi * cutoff / width * delta)),
                        0.0)
        sinc = np.where(delta == 0.0, 2 * cutoff,
                        np.sin(2 * np.pi * cutoff * delta)
                        / np.where(delta == 0.0, 1.0, np.pi * delta))
        out[i] = np.sum(x[j_lo:j_hi + 1] * hann * sinc) / orig_freq
    return out


def scipy_linear_resample(x, orig_freq, new_freq, width=6):
    """SECOND independent oracle: Kaldi's LinearResample expressed through
    scipy's compiled polyphase machinery (``scipy.signal.upfirdn``), sharing
    NOTHING with :func:`naive_linear_resample` or the package implementation
    except the kernel definition itself (the algorithm spec: Hann-windowed
    sinc at cutoff 0.99 * min(sr) / 2, torchaudio.compliance.kaldi /
    reference data_utils.py:20-21).

    Derivation: output i sums x[j] * w(j/orig - i/new); with L = new/gcd,
    M = orig/gcd the argument is (jL - iM) / (L*orig) — the kernel sampled
    on the lcm grid — and w is even, so this is exactly
    ``upfirdn(h, x, up=L, down=M)`` with h[m] = w((m - K - p)/(L*orig)),
    zero-padded by p = (-K) % M so the kernel center lands on a
    downsample-aligned index, outputs shifted by (K + p) / M.

    A recorded real-torchaudio golden is unobtainable in this image
    (torchaudio absent, no network); two structurally independent oracles —
    direct per-output summation here, scipy's C polyphase there — agreeing
    to 1e-13 is the strongest available substitute.
    """
    from math import gcd

    from scipy.signal import upfirdn

    cutoff = 0.99 * 0.5 * min(orig_freq, new_freq)
    half_width = width / (2.0 * cutoff)
    g = gcd(orig_freq, new_freq)
    up, down = new_freq // g, orig_freq // g
    grid = up * orig_freq                      # lcm(orig, new)
    half_taps = int(np.floor(half_width * grid))
    pad = (-half_taps) % down
    m = np.arange(-half_taps - pad, half_taps + 1, dtype=np.float64)
    d = m / grid
    hann = np.where(np.abs(d) < half_width,
                    0.5 * (1 + np.cos(2 * np.pi * cutoff / width * d)), 0.0)
    sinc = np.where(d == 0.0, 2 * cutoff,
                    np.sin(2 * np.pi * cutoff * d)
                    / np.where(d == 0.0, 1.0, np.pi * d))
    h = hann * sinc / orig_freq
    shift = (half_taps + pad) // down
    n_out = int(np.ceil(len(x) * new_freq / orig_freq))
    return upfirdn(h, x, up=up, down=down)[shift:shift + n_out]


class TestResample:
    @pytest.mark.parametrize('sr_in,sr_out', [(44100, 16000), (48000, 16000),
                                              (16000, 22050)])
    def test_golden_vs_naive_direct_sum(self, sr_in, sr_out):
        rng = np.random.RandomState(3)
        x = (rng.randn(int(sr_in * 0.1)) * 0.5).astype(np.float32)
        ours = np.asarray(resample_waveform(x[None], sr_in, sr_out))[0]
        oracle = naive_linear_resample(x.astype(np.float64), sr_in, sr_out)
        assert ours.shape == oracle.shape
        np.testing.assert_allclose(ours, oracle, atol=1e-5)

    @pytest.mark.parametrize('sr_in,sr_out', [(44100, 16000), (48000, 16000),
                                              (16000, 22050), (16000, 16000),
                                              (8000, 16000)])
    def test_golden_vs_scipy_polyphase(self, sr_in, sr_out):
        """Triangulates the resampler against a second, structurally
        independent oracle (scipy upfirdn polyphase) — incl. the equal-rate
        FIR fast path, which the naive-oracle test does not parametrize."""
        scipy_signal = pytest.importorskip('scipy.signal')
        del scipy_signal
        rng = np.random.RandomState(7)
        x = (rng.randn(int(sr_in * 0.1)) * 0.5).astype(np.float32)
        ours = np.asarray(resample_waveform(x[None], sr_in, sr_out))[0]
        oracle = scipy_linear_resample(x.astype(np.float64), sr_in, sr_out)
        assert ours.shape == oracle.shape
        np.testing.assert_allclose(ours, oracle, atol=1e-5)
        # and the two oracles agree with each other far below that tolerance
        naive = naive_linear_resample(x.astype(np.float64), sr_in, sr_out)
        np.testing.assert_allclose(oracle, naive, atol=1e-11)

    def test_identity_rate_close(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 8000).astype(np.float32) * 0.3
        y = np.asarray(resample_waveform(x, 16000, 16000))
        assert y.shape == x.shape
        # lowpass at 7.92 kHz barely touches white noise energy below cutoff
        np.testing.assert_allclose(y[:, 100:-100], x[:, 100:-100], atol=0.2)

    def test_tone_preserved_across_rates(self):
        sr_in, sr_out, f = 44100, 16000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
        y = np.asarray(resample_waveform(x, sr_in, sr_out))
        # Kaldi convention: ceil(samples * new / orig)
        assert y.shape[-1] == int(np.ceil(x.shape[-1] * sr_out / sr_in))
        # measure the dominant frequency of the resampled tone
        spec = np.abs(np.fft.rfft(y[0, 1000:9000] * np.hanning(8000)))
        f_est = spec.argmax() * sr_out / 8000
        assert abs(f_est - f) < 3.0
        # amplitude preserved
        assert abs(np.abs(y[0, 1000:9000]).max() - 1.0) < 0.05

    def test_downsample_removes_high_freq(self):
        sr_in, sr_out = 48000, 16000
        t = np.arange(sr_in) / sr_in
        # 10 kHz tone is above the 16 kHz Nyquist -> must be attenuated
        x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)[None]
        y = np.asarray(resample_waveform(x, sr_in, sr_out))
        assert np.abs(y[:, 100:-100]).max() < 0.05


class TestLoadWav:
    def test_layout_and_norm(self, tmp_path):
        sr = 16000
        rng = np.random.RandomState(2)
        data = (rng.randn(2, sr) * 0.1).astype(np.float32)
        p = tmp_path / 'x.wav'
        _write_wav(p, data, sr, n_chan=2)

        spec = load_wav(str(p))
        assert spec.ndim == 3
        assert spec.shape[0] == 257
        assert spec.shape[2] == 4  # 2 chan * (real, imag)

    def test_rms_normalize(self):
        x = np.full((2, 100), 2.0, np.float32)
        y = np.asarray(rms_normalize(x))
        np.testing.assert_allclose(np.sqrt((y**2).mean()) * 10, 1.0, rtol=1e-5)

    def test_read_wav_roundtrip(self, tmp_path):
        sr = 8000
        data = (np.sin(np.arange(800) / 10)[None] * 0.5).astype(np.float32)
        p = tmp_path / 'y.wav'
        _write_wav(p, data, sr, n_chan=1)
        back, rate = read_wav(str(p))
        assert rate == sr
        np.testing.assert_allclose(back, data, atol=1e-3)

    def test_int16_device_path_bit_identical(self, tmp_path):
        """load_wav_device's int16 upload (halved transfer) must match the
        host float conversion bit-for-bit: raw/32768 on device == the
        read_wav float path."""
        from challenge_tpu.ops.dsp import load_wav_device, read_wav_raw, \
            wav_to_spec
        import jax.numpy as jnp
        sr = 16000
        rng = np.random.default_rng(0)
        data = (rng.standard_normal((2, 4000)) * 0.2).astype(np.float32)
        p = tmp_path / 'z.wav'
        _write_wav(p, data, sr, n_chan=2)
        raw, rate = read_wav_raw(str(p))
        assert raw is not None and raw.dtype == np.int16 and rate == sr
        wav_f, _ = read_wav(str(p))
        np.testing.assert_array_equal(raw.astype(np.float32) / 32768.0, wav_f)
        via_int16 = np.asarray(load_wav_device(str(p)))
        via_float = np.asarray(wav_to_spec(jnp.asarray(wav_f), rate))
        np.testing.assert_array_equal(via_int16, via_float)
