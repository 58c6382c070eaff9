"""Context-window extraction and overlap-averaged reconstruction.

Behavioral spec (reference: utils.py:13-71, pinned by utils_test.py:7-33):
given a set of *relative* frame offsets (e.g. ``[-3, -1, 0, 1, 3]``), cut one
window per anchor frame, zero-padding the sequence so anchors near the edges
still yield full windows; the inverse scatters window columns back to their
absolute frame positions and divides by the per-frame hit count.

Host-side numpy — used for offline TTA / windowed prediction assembly, not
in the jitted path (the jitted eval path uses frame + overlap_and_add).
Implementation is original: extraction via a strided sliding-window view,
reconstruction via one vectorized ``np.add.at`` scatter (no Python loop
over offsets).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

EPSILON = 1e-8


def _normalize_offsets(offsets):
    """Relative offsets -> (zero-based offsets, span = max offset + 1)."""
    rel = np.asarray(offsets, dtype=np.int64)
    rel = (rel - rel.min()).astype(np.int32)
    return rel, int(rel.max()) + 1


def seq_to_windows(seq, window, skip: int = 1, padding: bool = True,
                   **pad_kwargs):
    """Cut context windows from ``seq``.

    seq:     [T, ...];  window: relative offsets;  skip: anchor stride.
    Returns [ceil(T / skip), len(window), ...]. With ``padding`` the
    sequence is extended by span//2 zeros in front and (span-1)//2 behind
    (``pad_kwargs`` forwarded to ``np.pad``), so every anchor in range(0,
    T, skip) has a full window.
    """
    seq = np.asarray(seq)
    rel, span = _normalize_offsets(window)

    if padding:
        head, tail = span // 2, (span - 1) // 2
        widths = [(head, tail)] + [(0, 0)] * (seq.ndim - 1)
        seq = np.pad(seq, widths, mode='constant', **pad_kwargs)
        # all 'full' span-windows of the padded sequence, window axis at 1
        full = sliding_window_view(seq, span, axis=0)
        full = np.moveaxis(full, -1, 1)
        return full[::skip][:, rel]

    anchors = np.arange(0, len(seq), skip, dtype=np.int64)
    return seq[anchors[:, None] + rel[None, :]]


def windows_to_seq(windows, window, skip: int = 1):
    """Inverse of :func:`seq_to_windows`: scatter every window column back
    to its absolute frame and average over the number of contributions.

    windows: [n_windows, len(window), ...] -> [(n_windows-1)*skip + 1, ...]
    """
    windows = np.asarray(windows)
    rel, span = _normalize_offsets(window)
    n_win = windows.shape[0]
    out_len = (n_win - 1) * skip + 1

    # absolute target frame of windows[i, j]; reference centers with
    # (span-1)//2 (its `win_size` is max(window), utils.py:60-68)
    anchors = np.arange(n_win, dtype=np.int64) * skip - (span - 1) // 2
    targets = (anchors[:, None] + rel[None, :]).ravel()
    in_range = (targets >= 0) & (targets < out_len)

    feat_shape = windows.shape[2:]
    flat = windows.reshape(n_win * len(rel), *feat_shape)
    total = np.zeros((out_len, *feat_shape), dtype=np.result_type(
        windows.dtype, np.float64))
    np.add.at(total, targets[in_range], flat[in_range])

    hits = np.zeros(out_len, dtype=np.float64)
    np.add.at(hits, targets[in_range], 1.0)
    hits = hits.reshape((out_len,) + (1,) * len(feat_shape))
    return total / (hits + EPSILON)
