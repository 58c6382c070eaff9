"""Index-window round-trip utilities (reference: utils.py:13-71).

Host-side numpy: used for offline TTA / windowed prediction assembly, not in
the jitted path (the jitted eval path uses frame + overlap_and_add instead).
"""

from __future__ import annotations

import numpy as np

EPSILON = 1e-8


def seq_to_windows(seq, window, skip: int = 1, padding: bool = True, **kwargs):
    """seq [T, ...] + relative index window -> [n_windows, window_size, ...]."""
    window = np.array(window - np.min(window)).astype(np.int32)
    win_size = max(window) + 1
    windows = window[np.newaxis, :] \
        + np.arange(0, len(seq), skip)[:, np.newaxis]
    if padding:
        seq = np.pad(
            seq,
            [[win_size // 2, (win_size - 1) // 2]] + [[0, 0]] * len(seq.shape[1:]),
            mode='constant',
            **kwargs)
    return np.take(seq, windows, axis=0)


def windows_to_seq(windows, window, skip: int = 1):
    """Inverse of seq_to_windows with overlap-count averaging."""
    n_window = windows.shape[0]
    window = np.array(window - np.min(window)).astype(np.int32)
    win_size = max(window)

    seq_len = (n_window - 1) * skip + 1
    seq = np.zeros([seq_len, *windows.shape[2:]], dtype=windows.dtype)
    count = np.zeros(seq_len)

    for i, w in enumerate(window):
        indices = np.arange(n_window) * skip - win_size // 2 + w
        select = np.logical_and(0 <= indices, indices < seq_len)
        seq[indices[select]] += windows[select, i]
        count[indices[select]] += 1

    return seq / (count + EPSILON)
