"""Optimizers, gradient clipping, LR schedule (reference: sj_train.py:133-155,
434-442; utils.py:140-288, 350-366).

Built on optax. The learning rate is exposed through
``optax.inject_hyperparams`` so the epoch loop can overwrite it exactly like
Keras' ``LearningRateScheduler`` (reference: sj_train.py:501-503).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


# ------------------------------------------------------------------- AGC
def unitwise_norm(x):
    """NFNet unitwise L2 norm (reference: utils.py:350-366): full norm for
    scalars/vectors, per-output-column for 2-3D, per-output-channel for HWIO
    conv kernels."""
    if x.ndim <= 1:
        axis, keepdims = None, False
    elif x.ndim in (2, 3):
        axis, keepdims = 0, True
    elif x.ndim == 4:
        axis, keepdims = (0, 1, 2), True
    else:
        raise ValueError(
            f'unitwise_norm supports rank <= 4 parameters, got {x.shape}')
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims))


def adaptive_clip_grad(params, grads, clip_factor: float = 0.01,
                       eps: float = 1e-3):
    """Adaptive gradient clipping (reference: sj_train.py:145-155): scale each
    gradient unit down where its norm exceeds clip_factor x parameter norm."""
    def clip_one(p, g):
        p_norm = unitwise_norm(p)
        g_norm = unitwise_norm(g)
        max_norm = jnp.maximum(p_norm, eps) * clip_factor
        clipped = g * (max_norm / jnp.maximum(g_norm, 1e-6))
        return jnp.where(g_norm < max_norm, g, clipped)
    return jax.tree.map(clip_one, params, grads)


# -------------------------------------------------------------- AdaBelief
class ScaleByAdaBeliefState(NamedTuple):
    count: chex.Array
    m: optax.Updates
    v: optax.Updates
    vhat: Optional[optax.Updates]


def scale_by_adabelief(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-7, amsgrad: bool = False):
    """From-scratch AdaBelief (reference: utils.py:140-288): the second moment
    tracks (g - m_t)^2 — the belief in the gradient — with Adam-style bias
    correction folded into the step size and eps added *outside* the sqrt."""
    def init_fn(params):
        m = jax.tree.map(jnp.zeros_like, params)
        v = jax.tree.map(jnp.zeros_like, params)
        vhat = jax.tree.map(jnp.zeros_like, params) if amsgrad else None
        return ScaleByAdaBeliefState(jnp.zeros([], jnp.int32), m, v, vhat)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         state.m, updates)
        v = jax.tree.map(
            lambda v_, g, m_: b2 * v_ + (1 - b2) * jnp.square(g - m_),
            state.v, updates, m)
        # lr multiplier sqrt(1-b2^t)/(1-b1^t) (reference: utils.py:176-179)
        corr = jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        if amsgrad:
            vhat = jax.tree.map(jnp.maximum, state.vhat, v)
            denom_tree = vhat
        else:
            vhat = None
            denom_tree = v
        new_updates = jax.tree.map(
            lambda m_, v_: corr * m_ / (jnp.sqrt(v_) + eps),
            m, denom_tree)
        return new_updates, ScaleByAdaBeliefState(count, m, v, vhat)

    return optax.GradientTransformation(init_fn, update_fn)


# ----------------------------------------------- Keras-parity optimizers
# The reference compiles plain Keras optimizers (sj_train.py:434-442), whose
# update rules differ from the stock optax stacks in two ways that matter
# numerically (verified against tf.keras on this TF build; differential
# tests pin each):
#   * Adam adds eps OUTSIDE the bias correction: step = lr_t*m/(sqrt(v)+eps)
#     with lr_t = lr*sqrt(1-b2^t)/(1-b1^t), while optax.scale_by_adam's eps
#     applies to the bias-corrected v_hat — an effective eps 1/sqrt(1-b2^t)
#     (~31x at step 1) larger, visibly different on near-zero-variance
#     gradients early in training;
#   * SGD/RMSprop fold the LR INTO the momentum buffer (accum = m*accum -
#     lr*g), so an LR change decays in over ~1/(1-m) steps, whereas
#     optax.trace + scale_by_learning_rate rescales the entire momentum
#     history instantly — the two diverge for several steps after every
#     per-epoch LearningRateScheduler update.


class ScaleByKerasAdamState(NamedTuple):
    count: chex.Array
    m: optax.Updates
    v: optax.Updates


def scale_by_keras_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-7):
    """Keras Adam semantics (reference: sj_train.py:434-435 compiles
    ``Adam(lr, clipvalue=...)``): bias correction folded into the step size,
    eps added to the UNcorrected sqrt(v)."""
    def init_fn(params):
        return ScaleByKerasAdamState(jnp.zeros([], jnp.int32),
                                     jax.tree.map(jnp.zeros_like, params),
                                     jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         state.m, updates)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * jnp.square(g),
                         state.v, updates)
        corr = jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        new_updates = jax.tree.map(
            lambda m_, v_: corr * m_ / (jnp.sqrt(v_) + eps), m, v)
        return new_updates, ScaleByKerasAdamState(count, m, v)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasMomentumState(NamedTuple):
    accum: optax.Updates


def keras_sgd_momentum(learning_rate, momentum: float = 0.9):
    """Keras SGD(momentum) (reference: sj_train.py:436-437):
    ``accum = momentum*accum - lr*g; var += accum`` — the LR rides inside
    the momentum buffer, so this transformation consumes the LR itself and
    must NOT be followed by scale_by_learning_rate."""
    def init_fn(params):
        return KerasMomentumState(jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        accum = jax.tree.map(
            lambda a, g: momentum * a - learning_rate * g,
            state.accum, updates)
        return accum, KerasMomentumState(accum)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasRMSpropState(NamedTuple):
    ms: optax.Updates
    mom: optax.Updates


def keras_rmsprop(learning_rate, rho: float = 0.9, momentum: float = 0.9,
                  eps: float = 1e-7):
    """Keras RMSprop with momentum (reference: sj_train.py:438-439):
    ``ms = rho*ms + (1-rho)*g^2; mom = momentum*mom + lr*g/sqrt(ms + eps);
    var -= mom`` — eps INSIDE the sqrt (the momentum>0 kernel's placement)
    and the LR inside the momentum buffer; consumes the LR itself."""
    def init_fn(params):
        return KerasRMSpropState(jax.tree.map(jnp.zeros_like, params),
                                 jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        ms = jax.tree.map(lambda s, g: rho * s + (1 - rho) * jnp.square(g),
                          state.ms, updates)
        mom = jax.tree.map(
            lambda mo, g, s: momentum * mo
            + learning_rate * g / jnp.sqrt(s + eps),
            state.mom, updates, ms)
        return jax.tree.map(lambda mo: -mo, mom), KerasRMSpropState(ms, mom)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config) -> optax.GradientTransformation:
    """Keras-parity optimizer stacks (reference: sj_train.py:434-442,
    trainer.py:239-246): every stack clips gradient values elementwise at
    ``clipvalue`` first, like Keras' ``clipvalue=`` argument, then applies
    the Keras update rule exactly (see the transformations above, each
    differentially tested against tf.keras on synthetic gradients).

    Wrapped in ``inject_hyperparams`` — set
    ``opt_state.hyperparams['learning_rate']`` to change LR between steps.
    """
    if config.optimizer not in ('adam', 'sgd', 'rmsprop', 'adabelief'):
        raise ValueError(f'unknown optimizer: {config.optimizer!r}')
    clip = config.clipvalue

    @optax.inject_hyperparams
    def make(learning_rate):
        if config.optimizer == 'sgd':
            # LR folded into the momentum buffer (Keras semantics)
            return optax.chain(optax.clip(clip),
                               keras_sgd_momentum(learning_rate))
        if config.optimizer == 'rmsprop':
            return optax.chain(optax.clip(clip),
                               keras_rmsprop(learning_rate))
        if config.optimizer == 'adam':
            core = scale_by_keras_adam()
        else:
            core = scale_by_adabelief()
        return optax.chain(
            optax.clip(clip),
            core,
            optax.scale_by_learning_rate(learning_rate),
        )

    return make(learning_rate=config.lr)


def set_learning_rate(opt_state, lr):
    """Overwrite the injected LR (the Keras ``LearningRateScheduler``
    analogue)."""
    opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)
    return opt_state


def custom_scheduler(d_model: float, warmup_steps: float = 4000,
                     lr_div: float = 2.0):
    """Transformer warmup schedule, called once per epoch
    (reference: sj_train.py:133-142)."""
    d_model = float(d_model)

    def _scheduler(step):
        step = float(step) + 1.0
        arg1 = step ** -0.5
        arg2 = step * (warmup_steps ** -1.5)
        return (d_model ** -0.5) * min(arg1, arg2) / lr_div
    return _scheduler
