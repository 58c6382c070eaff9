"""Normalization primitives (reference: utils.py:114-116, data_utils.py:37-55,
trainer.py:63-77 / eval.py:13-27 — the duplicated minmax_log_on_mel is unified
here)."""

from __future__ import annotations

import math

import jax.numpy as jnp

EPSILON = 1e-8                       # reference: utils.py:6
LOG_EPSILON = math.log(EPSILON)      # reference: transforms.py:8


def safe_div(x, y, eps: float = EPSILON):
    """x / max(y, eps) (reference: utils.py:114-116)."""
    return x / jnp.maximum(y, eps)


def minmax(x, y=None):
    """Per-sample min-max over all non-batch axes (reference: data_utils.py:37-47)."""
    axis = tuple(range(1, x.ndim))
    x_max = jnp.max(x, axis=axis, keepdims=True)
    x_min = jnp.min(x, axis=axis, keepdims=True)
    x = safe_div(x - x_min, x_max - x_min)
    if y is not None:
        return x, y
    return x


def log_on_mel(mel, labels=None):
    """log(mel + eps) (reference: data_utils.py:50-55)."""
    mel = jnp.log(mel + EPSILON)
    if labels is not None:
        return mel, labels
    return mel


def minmax_log_on_mel(mel, labels=None):
    """Fused per-sample min-max then log (reference: trainer.py:63-77)."""
    axis = tuple(range(1, mel.ndim))
    mel_max = jnp.max(mel, axis=axis, keepdims=True)
    mel_min = jnp.min(mel, axis=axis, keepdims=True)
    mel = safe_div(mel - mel_min, mel_max - mel_min)
    mel = jnp.log(mel + EPSILON)
    if labels is not None:
        return mel, labels
    return mel
