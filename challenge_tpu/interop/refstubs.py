"""sys.modules stubs for dependencies of the reference stack that are not in
this image, so the reference's own source (model builders, eval loop, test
modules) can be imported and executed for differential tests and baseline
timing.

* ``torchaudio`` (reference: data_utils.py:1-29) — only the three calls the
  reference makes: ``load`` (16-bit PCM via the stdlib ``wave`` module),
  ``compliance.kaldi.resample_waveform`` (identity when rates match — our
  eval wavs are already 16 kHz; anything else raises), and
  ``transforms.Spectrogram(n_fft, power=None)``, which torchaudio implements
  as ``torch.stft`` with a Hann window, hop n_fft//2, centered reflect
  padding — reproduced here with ``torch.stft`` directly, returning the
  real/imag-stacked layout the reference indexes.
* ``tensorflow_addons`` (reference: metrics.py:7) — ``tfa.metrics.F1Score``
  only, backed by Keras' built-in F1Score (same micro/none averaging knobs).
"""

from __future__ import annotations

import sys
import types


def _make_torchaudio():
    import numpy as np
    import torch

    ta = types.ModuleType('torchaudio')
    comp = types.ModuleType('torchaudio.compliance')
    kaldi = types.ModuleType('torchaudio.compliance.kaldi')
    tr = types.ModuleType('torchaudio.transforms')

    def load(path):
        import wave as wave_mod
        with wave_mod.open(path, 'rb') as f:
            n, ch, sr = f.getnframes(), f.getnchannels(), f.getframerate()
            width = f.getsampwidth()
            if width != 2:
                raise ValueError(f'torchaudio stub: only 16-bit PCM ({path})')
            pcm = np.frombuffer(f.readframes(n), np.int16).reshape(-1, ch)
        return torch.from_numpy((pcm.T / 32768.0).astype('float32')), sr

    def resample_waveform(wav, orig_freq, new_freq):
        if int(orig_freq) != int(new_freq):
            raise NotImplementedError(
                'torchaudio stub resamples only at matching rates '
                f'({orig_freq} -> {new_freq}); use 16 kHz wavs')
        return wav

    class Spectrogram:
        def __init__(self, n_fft, power=None):
            if power is not None:
                raise NotImplementedError('stub supports power=None only')
            self.n_fft = int(n_fft)

        def __call__(self, wav):
            s = torch.stft(wav, self.n_fft, self.n_fft // 2, self.n_fft,
                           torch.hann_window(self.n_fft), center=True,
                           pad_mode='reflect', normalized=False,
                           onesided=True, return_complex=True)
            return torch.view_as_real(s)   # [chan, freq, time, 2]

    ta.load = load
    kaldi.resample_waveform = resample_waveform
    comp.kaldi = kaldi
    tr.Spectrogram = Spectrogram
    ta.compliance = comp
    ta.transforms = tr
    return {'torchaudio': ta, 'torchaudio.compliance': comp,
            'torchaudio.compliance.kaldi': kaldi,
            'torchaudio.transforms': tr}


def _make_tfa():
    tfa = types.ModuleType('tensorflow_addons')
    tfa_metrics = types.ModuleType('tensorflow_addons.metrics')

    class F1Score:
        """tfa.metrics.F1Score facade over keras.metrics.F1Score.

        tfa accepted inputs with extra leading dims (the reference feeds
        [batch, time, class] frame grids, metrics.py:297); Keras 3's
        F1Score insists on 2D — flattening every leading dim is EXACT for
        the reference's ``average='micro'`` (micro-F1 sums tp/fp/fn over
        all elements regardless of grouping) and an identity for 2D."""

        def __new__(cls, num_classes=None, average=None, threshold=None,
                    name='f1_score', **kwargs):
            import tensorflow as tf

            class _FlattenF1(tf.keras.metrics.F1Score):
                def update_state(self, y_true, y_pred,
                                 sample_weight=None):
                    c = tf.shape(y_true)[-1]
                    return super().update_state(
                        tf.reshape(y_true, (-1, c)),
                        tf.reshape(y_pred, (-1, c)), sample_weight)
            return _FlattenF1(average=average, threshold=threshold,
                              name=name)

    tfa_metrics.F1Score = F1Score
    tfa.metrics = tfa_metrics
    return {'tensorflow_addons': tfa,
            'tensorflow_addons.metrics': tfa_metrics}


def install_stubs():
    """Install the stubs for any of the modules not already importable.
    Idempotent; returns the list of module names stubbed."""
    stubbed = []
    for probe, maker in (('torchaudio', _make_torchaudio),
                         ('tensorflow_addons', _make_tfa)):
        if probe in sys.modules:
            continue
        try:
            __import__(probe)
        except ImportError:
            mods = maker()
            sys.modules.update(mods)
            stubbed.append(probe)
    return stubbed


def install_keras2_compat():
    """Keras-2-era APIs the reference's TRAINING path touches that Keras 3
    renamed — restored as pure aliases (no semantic change) so the
    reference's sj_train.py code runs verbatim under this image's Keras:

    * ``Variable.get_shape()`` (used by utils.py:351 unitwise_norm inside
      the AGC train step) — alias of ``.shape``.

    Inference/eval paths never needed this (the reference's test modules
    and its evaluate() run unmodified); only head-to-head TRAINING of the
    reference stack does. Idempotent; returns the list of shims applied.
    """
    applied = []
    try:
        from keras.src.backend.common.variables import Variable
        if not hasattr(Variable, 'get_shape'):
            Variable.get_shape = lambda self: self.shape
            applied.append('Variable.get_shape')
    except Exception:
        pass
    return applied
