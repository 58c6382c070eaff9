"""Shared test fixtures: synthetic spec banks, wav writers, and the CLI
data-file set. One definition each — geometry-specific bank builders stay
local to their test files because their shapes pin frozen goldens."""

import os
import pickle
import wave

import numpy as np

from challenge_tpu.data import build_banks


def make_banks():
    """The canonical tiny bank set (3 bgs / 4 voices / 3 noises) shared by
    the frozen-golden and parallel tests. Construction order is pinned:
    the frozen goldens in test_frozen_goldens.py depend on these exact
    draws."""
    rng = np.random.default_rng(0)
    return build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)])


def write_wav(path, seconds=6.0, sr=16000, chans=2, seed=0, tone_hz=None):
    """Seeded noise wav (optionally with a tone on channel 0 so eval tests
    have some structure to detect); int16 PCM like the challenge data."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    sig = 0.1 * rng.standard_normal((n, chans))
    if tone_hz:
        t = np.arange(n) / sr
        sig[:, 0] += 0.3 * np.sin(2 * np.pi * tone_hz * t)
    pcm = np.clip(sig * 32767, -32768, 32767).astype('<i2')
    with wave.open(str(path), 'wb') as f:
        f.setnchannels(chans)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def make_datafiles(dirpath, n_frame=64):
    """Write the full pickled spec-set + labels file layout both training
    CLIs expect (train and test_ prefixed sets plus noise.pickle)."""
    rng = np.random.default_rng(0)

    def specs(n, t_lo, t_hi):
        return [rng.standard_normal((257, int(rng.integers(t_lo, t_hi)), 4)
                                    ).astype('f4') * 0.1 for _ in range(n)]

    for prefix in ('', 'test_'):
        with open(os.path.join(dirpath, f'{prefix}bg.pickle'), 'wb') as f:
            pickle.dump(specs(3, n_frame + 10, n_frame + 40), f)
        with open(os.path.join(dirpath, f'{prefix}voice.pickle'), 'wb') as f:
            pickle.dump(specs(4, 30, 50), f)
        # 30-class labels exercise the //10 remap (reference: sj_train.py:86-87)
        np.save(os.path.join(dirpath, f'{prefix}labels.npy'),
                rng.integers(0, 30, size=4))
    with open(os.path.join(dirpath, 'noise.pickle'), 'wb') as f:
        pickle.dump(specs(3, 15, 30), f)


DATA_FLAGS = ['--background_sounds', 'bg.pickle',
              '--voices', 'voice.pickle',
              '--labels', 'labels.npy',
              '--noises', 'noise.pickle',
              '--test_background_sounds', 'test_bg.pickle',
              '--test_voices', 'test_voice.pickle',
              '--test_labels', 'test_labels.npy']
