"""Kernel regularization (reference: utils.py:100-108
``apply_kernel_regularizer`` + trainer.py:248-250).

Keras mutates layer objects and clones the model; the functional equivalent
is a pure penalty over the parameter pytree's Dense/Conv ``kernel`` leaves,
added to the training loss inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_l2(l1: float = 0.0, l2: float = 0.0):
    """Returns penalty(params) summing l1*|w| + l2*w^2 over kernel leaves
    (Dense and Conv kernels only, like Keras' layer_types filter —
    reference: utils.py:102)."""
    def penalty(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        total = jnp.zeros([], jnp.float32)
        for path, leaf in flat:
            name = getattr(path[-1], 'key', str(path[-1]))
            if name == 'kernel':
                if l1:
                    total = total + l1 * jnp.sum(jnp.abs(leaf))
                if l2:
                    total = total + l2 * jnp.sum(jnp.square(leaf))
        return total
    return penalty


def apply_kernel_regularizer(loss_fn, regularizer):
    """Wrap a ``(y_true, y_pred) -> (loss, parts)`` loss so the train step
    adds ``regularizer(params)`` (the functional analogue of the reference's
    clone-and-mutate helper)."""
    def wrapped(y_true, y_pred, params):
        loss, parts = loss_fn(y_true, y_pred)
        return loss + regularizer(params), parts
    wrapped.needs_params = True
    return wrapped
