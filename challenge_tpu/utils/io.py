"""Host I/O: pickled/npy spec-set loading and generator adapters
(reference: utils.py:77-94)."""

from __future__ import annotations

import pickle

import numpy as np


def load_data(path: str):
    """Load a pickled list of spectrograms or an .npy label array
    (reference: utils.py:88-94)."""
    if path.endswith('.pickle'):
        with open(path, 'rb') as f:
            return pickle.load(f)
    elif path.endswith('.npy'):
        return np.load(path)
    raise ValueError('invalid file format')


def list_to_generator(dataset):
    """list (or tuple of parallel lists) -> generator factory
    (reference: utils.py:77-85)."""
    def _gen():
        if isinstance(dataset, tuple):
            for z in zip(*dataset):
                yield z
        else:
            for data in dataset:
                yield data
    return _gen
