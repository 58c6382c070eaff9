"""Windowed/TTA prediction helpers (reference: utils.py:119-134).

``predict``: batched forward with optional reversed-channel test-time
augmentation (predictions of the channel-reversed input are degree-flipped in
blocks of 10 and averaged) and optional VAD gating
(``out[..., :30] * sigmoid(out[..., 30:])``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predict(apply_fn, xs, reverse_and_add: bool = False, vad: bool = False):
    """apply_fn: x -> predictions (e.g. functools.partial(bundle.apply,
    variables)). Mirrors the reference's ``predict(model, xs, ...)``."""
    output = apply_fn(xs)
    if vad:
        output = output[..., :30] * jax.nn.sigmoid(output[..., 30:])

    if reverse_and_add:
        rev_output = apply_fn(jnp.flip(xs, axis=-1))
        if vad:
            rev_output = rev_output[..., :30] * jax.nn.sigmoid(
                rev_output[..., 30:])
        shape = rev_output.shape[:-1]
        rev_output = rev_output.reshape(*shape, -1, 10)
        rev_output = jnp.flip(rev_output, -1)
        rev_output = rev_output.reshape(*shape, -1)
        output = (output + rev_output) / 2
    return output
