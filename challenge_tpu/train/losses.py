"""Training losses (reference: utils.py:291-347, trainer.py:144-189,
sj_train.py:447-461).

All losses are pure jnp functions ``(y_true, y_pred) -> scalar`` (Keras
'auto' reduction: mean over the batch of the per-sample loss).
"""

from __future__ import annotations

import jax.numpy as jnp

from challenge_tpu.ops.norms import safe_div

KERAS_EPS = 1e-7   # Keras backend.epsilon(): probability clip for log losses


def _clip_prob(p):
    return jnp.clip(p, KERAS_EPS, 1.0 - KERAS_EPS)


def binary_crossentropy(y_true, y_pred):
    """Keras BinaryCrossentropy(): elementwise BCE, mean over everything."""
    p = _clip_prob(y_pred)
    ce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
    return jnp.mean(ce)


def sigmoid_focal_crossentropy(y_true, y_pred, alpha: float = 0.25,
                               gamma: float = 2.0):
    """Focal loss (reference: utils.py:291-347): per-element
    alpha/modulating-weighted BCE, summed over classes, meaned over time and
    batch."""
    p = _clip_prob(y_pred)
    ce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
    p_t = y_true * y_pred + (1.0 - y_true) * (1.0 - y_pred)
    alpha_factor = y_true * alpha + (1.0 - y_true) * (1.0 - alpha)
    modulating = jnp.power(1.0 - p_t, gamma)
    per_sample = jnp.mean(jnp.sum(alpha_factor * modulating * ce, axis=-1),
                          axis=-1)
    return jnp.mean(per_sample)


def mae(y_true, y_pred):
    """Keras MAE: mean |err| over the last axis, then over everything."""
    return jnp.mean(jnp.abs(y_true - y_pred))


def se_loss(cls_loss_fn, loss_weights=(1.0, 10.0, 10.0)):
    """The 'se' v9 composite loss: [cls, MAE(speech), MAE(noise)] with
    loss_weights [1, 10, 10] (reference: sj_train.py:451-452,461).

    Returns (total, parts_dict) for per-head logging."""
    def _loss(y_true, y_pred):
        parts = {
            'class_loss': cls_loss_fn(y_true[0], y_pred[0]),
            'speech_loss': mae(y_true[1], y_pred[1]),
            'noise_loss': mae(y_true[2], y_pred[2]),
        }
        total = (loss_weights[0] * parts['class_loss']
                 + loss_weights[1] * parts['speech_loss']
                 + loss_weights[2] * parts['noise_loss'])
        return total, parts
    return _loss


def density_loss(alpha: float = 0.8, l2: float = 1.0):
    """Count + total-variation loss over 30-dim density labels
    (reference: trainer.py:144-189). y: [B, time, 30] = [3 classes x 10
    'degrees']."""
    def _loss(y_true, y_pred):
        # [B, T, 30] -> [B, T, 3, 10]
        t_true = jnp.stack(jnp.split(y_true, 3, axis=-1), axis=-2)
        t_pred = jnp.stack(jnp.split(y_pred, 3, axis=-1), axis=-2)

        d_true = jnp.sum(t_true, axis=-2)     # [B, T, 10]
        d_pred = jnp.sum(t_pred, axis=-2)
        c_true = jnp.sum(t_true, axis=-1)     # [B, T, 3]
        c_pred = jnp.sum(t_pred, axis=-1)

        def _mae_last(a, b):
            return jnp.mean(jnp.abs(a - b), axis=-1)

        loss = alpha * _mae_last(jnp.sum(d_true, axis=1),
                                 jnp.sum(d_pred, axis=1)) \
            + (1 - alpha) * _mae_last(jnp.sum(c_true, axis=1),
                                      jnp.sum(c_pred, axis=1))

        n_d_true = safe_div(d_true, jnp.sum(d_true, axis=1, keepdims=True))
        n_d_pred = safe_div(d_pred, jnp.sum(d_pred, axis=1, keepdims=True))
        n_c_true = safe_div(c_true, jnp.sum(c_true, axis=1, keepdims=True))
        n_c_pred = safe_div(c_pred, jnp.sum(c_pred, axis=1, keepdims=True))

        tv = alpha * jnp.mean(
            jnp.sum(jnp.abs(n_d_true - n_d_pred), axis=1)
            * jnp.sum(d_true, axis=1), axis=1)
        tv += (1 - alpha) * jnp.mean(
            jnp.sum(jnp.abs(n_c_true - n_c_pred), axis=1)
            * jnp.sum(c_true, axis=1), axis=1)
        loss = loss + l2 * tv
        return jnp.mean(loss)
    return _loss


def get_loss(config):
    """Loss selection (reference: sj_train.py:447-452)."""
    name = config.loss.upper()
    if name == 'BCE':
        base = binary_crossentropy
    elif name == 'FOCAL':
        base = sigmoid_focal_crossentropy
    elif name in ('MSE',):
        base = lambda t, p: jnp.mean(jnp.square(t - p))  # noqa: E731
    elif name in ('MAE',):
        base = mae
    else:
        raise ValueError(f'unknown loss: {config.loss!r}')
    if config.model_type == 'se' and config.v == 9:
        return se_loss(base)
    return lambda t, p: (base(t, p), {})
