"""Window round-trip utilities, pinned to the reference's golden behavior
(reference: utils.py:13-71, utils_test.py:7-33) plus a live differential
test against the actual reference implementation."""

import os

import numpy as np
import pytest

from challenge_tpu.utils import seq_to_windows, windows_to_seq

GOLDEN_SEQ = np.array([1, 2, 3, 4, 5])
GOLDEN_OFFSETS = np.array([-3, -1, 0, 1, 3])
GOLDEN_WINDOWS = np.array([[0, 0, 1, 2, 4],
                           [0, 1, 2, 3, 5],
                           [0, 2, 3, 4, 0],
                           [1, 3, 4, 5, 0],
                           [2, 4, 5, 0, 0]])


def test_seq_to_windows_golden():
    np.testing.assert_array_equal(
        seq_to_windows(GOLDEN_SEQ, GOLDEN_OFFSETS), GOLDEN_WINDOWS)
    np.testing.assert_array_equal(
        seq_to_windows(GOLDEN_SEQ, GOLDEN_OFFSETS, skip=2),
        GOLDEN_WINDOWS[::2])


def test_windows_to_seq_golden():
    np.testing.assert_allclose(
        windows_to_seq(GOLDEN_WINDOWS, GOLDEN_OFFSETS), GOLDEN_SEQ, atol=1e-6)
    np.testing.assert_allclose(
        windows_to_seq(GOLDEN_WINDOWS[::2], GOLDEN_OFFSETS, skip=2),
        GOLDEN_SEQ, atol=1e-6)


def test_round_trip_multidim():
    rng = np.random.default_rng(0)
    seq = rng.standard_normal((23, 4, 2)).astype('f4')
    offsets = np.array([-2, 0, 1, 4])
    for skip in (1, 2):
        win = seq_to_windows(seq, offsets, skip=skip)
        assert win.shape == ((len(seq) + skip - 1) // skip, 4, 4, 2)
        rec = windows_to_seq(win, offsets, skip=skip)
        n = (win.shape[0] - 1) * skip + 1
        np.testing.assert_allclose(rec, seq[:n], atol=1e-5)


def test_no_padding_indexes_raw_sequence():
    seq = np.arange(10, 30)
    out = seq_to_windows(seq, np.array([0, 2]), skip=4, padding=False)
    np.testing.assert_array_equal(out[:, 0], seq[::4])
    np.testing.assert_array_equal(out[:, 1], seq[2::4][:len(out)])


@pytest.mark.skipif(not os.path.isfile('/root/reference/utils.py'),
                    reason='reference not mounted')
def test_differential_vs_reference():
    src = open('/root/reference/utils.py').read()
    # keep only the pure-numpy window helpers (drop tf/pickle imports)
    ns = {'np': np, 'EPSILON': 1e-8}
    for name in ('seq_to_windows', 'windows_to_seq'):
        start = src.index(f'def {name}(')
        end = src.index('\ndef ', start + 1)
        exec(compile(src[start:end], 'ref_utils.py', 'exec'), ns)

    rng = np.random.default_rng(7)
    seq = rng.standard_normal(37)
    for offsets in ([-3, -1, 0, 1, 3], [0, 1, 2], [-5, 0, 5]):
        offsets = np.array(offsets)
        for skip in (1, 2, 3):
            ours = seq_to_windows(seq, offsets, skip=skip)
            theirs = ns['seq_to_windows'](seq, offsets, skip=skip)
            np.testing.assert_allclose(ours, theirs, atol=0)
            np.testing.assert_allclose(
                windows_to_seq(ours, offsets, skip=skip),
                ns['windows_to_seq'](theirs, offsets, skip=skip), atol=1e-10)
