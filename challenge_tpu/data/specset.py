"""Spec-set banks: ragged host spectrogram lists -> fixed-shape device arrays.

The reference streams ragged spectrograms through three tf.data generator
pipelines with shuffle + padded_batch (reference: pipeline.py:113-175). On TPU
the whole working set fits in HBM, so we pad once host-side into a dense
*bank* ``[N, T_max, freq, chan]`` (time-major so that (voice, time) can be
flattened into a single gather axis) plus a length vector, and synthesize
batches entirely on device with gathers — no per-step host work at all.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SpecBank(NamedTuple):
    """A bank of padded spectrograms.

    data: [N, T_max, freq, chan]  (time-major; zero-padded past each length)
    lens: [N] int32 true frame counts
    """
    data: jax.Array
    lens: jax.Array

    @property
    def n(self) -> int:
        return self.data.shape[0]

    @property
    def t_max(self) -> int:
        return self.data.shape[1]


def build_bank(specs: Sequence[np.ndarray], t_max: Optional[int] = None,
               device=None) -> SpecBank:
    """Pad a list of [freq, T_i, chan] arrays into a SpecBank.

    Input layout follows the reference convention [freq, time, chan*2]; the
    bank stores time-major [N, T, freq, chan].
    """
    specs = [np.asarray(s, np.float32) for s in specs]
    freq, _, chan = specs[0].shape
    lens = np.array([s.shape[1] for s in specs], np.int32)
    t_pad = int(lens.max()) if t_max is None else int(t_max)
    out = np.zeros((len(specs), t_pad, freq, chan), np.float32)
    for i, s in enumerate(specs):
        t = min(s.shape[1], t_pad)
        out[i, :t] = s.transpose(1, 0, 2)[:t]
    data = jnp.asarray(out)
    lens = jnp.asarray(lens)
    if device is not None:
        data = jax.device_put(data, device)
        lens = jax.device_put(lens, device)
    return SpecBank(data, lens)


def remap_labels(labels: np.ndarray, n_classes: int) -> np.ndarray:
    """30-class -> 3-class remap + one-hot (reference: sj_train.py:86-88)."""
    labels = np.asarray(labels)
    if labels.max() - 1 != n_classes:
        labels = labels // 10
    return np.eye(n_classes, dtype='float32')[labels]
