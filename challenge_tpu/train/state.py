"""Functional train state and jitted train/eval steps.

The reference's ``CustomModel.train_step`` (sj_train.py:158-188) — forward,
loss, grads, AGC, apply — becomes a pure function
``(state, batch, rng) -> (state, metrics)`` compiled once by XLA. The 'se'
freeze flow (Keras ``trainable=False``) is a gradient mask. Everything —
including the optimizer and SWA average — lives on device; there is no
host round-trip inside an epoch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from challenge_tpu.models.registry import ModelBundle
from challenge_tpu.train import metrics as metrics_lib
from challenge_tpu.train.losses import get_loss
from challenge_tpu.train.optim import adaptive_clip_grad, make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # SWA running average of (params, batch_stats) — reference swa.py:36-44
    swa_params: Any
    swa_batch_stats: Any
    swa_count: jax.Array

    def weights(self):
        return {'params': self.params, 'batch_stats': self.batch_stats}

    def swa_weights(self):
        return {'params': self.swa_params, 'batch_stats': self.swa_batch_stats}


def init_state(bundle: ModelBundle, key, optimizer=None) -> TrainState:
    variables = bundle.init(key)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    optimizer = optimizer or make_optimizer(bundle.config)
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        swa_params=jax.tree.map(jnp.zeros_like, params),
        swa_batch_stats=jax.tree.map(jnp.zeros_like, batch_stats),
        swa_count=jnp.zeros([], jnp.int32),
    )


def _first(x):
    return x[0] if isinstance(x, (tuple, list)) else x


def make_grad_update(bundle: ModelBundle, optimizer=None,
                     use_agc: Optional[bool] = None, loss_fn=None):
    """The train step split at the gradient boundary, for accumulation.

    Returns ``(grad_fn, update_fn, optimizer)``:
      * ``grad_fn(params, batch_stats, batch, rng) -> (grads, new_stats,
        metrics)`` — forward + loss + backward over ONE (micro)batch;
      * ``update_fn(state, grads, new_stats) -> new_state`` — AGC, the 'se'
        freeze mask, and the optimizer apply, exactly once per optimizer
        step (so with accumulation AGC/clipvalue see the MEAN gradient,
        the same tensor a single big batch would produce).

    ``make_train_step`` composes the two; ``make_fused_train_step`` scans
    ``grad_fn`` over ``config.grad_accum`` microbatches before ``update_fn``.
    """
    config = bundle.config
    optimizer = optimizer or make_optimizer(config)
    loss_fn = loss_fn or get_loss(config)
    metric_fns = metrics_lib.batch_metrics(config)
    if use_agc is None:
        use_agc = config.model_type in ('vad', 'se')

    def grad_fn(params, batch_stats, batch, rng):
        x, y = batch

        def loss_of(params):
            rngs = {'dropout': rng} if bundle.needs_dropout_rng else None
            out, new_stats = bundle.apply(
                {'params': params, 'batch_stats': batch_stats},
                x, training=True, rngs=rngs)
            if getattr(loss_fn, 'needs_params', False):
                loss, parts = loss_fn(y, out, params)   # kernel regularizers
            else:
                loss, parts = loss_fn(y, out)
            return loss, (out, new_stats, parts)

        if getattr(config, 'remat', False):
            # full activation rematerialization: the backward pass re-runs
            # the forward instead of keeping activations live — trades ~one
            # extra forward of FLOPs for O(model depth) less HBM, the
            # standard lever for HBM-limited configs (big batch x the SE
            # cascade). Gradients are mathematically identical; a test pins
            # them numerically.
            loss_of = jax.checkpoint(loss_of)
        (loss, (out, new_stats, parts)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)

        metrics = {'loss': loss, **parts}
        for name, fn in metric_fns.items():
            metrics[name] = fn(_first(y), _first(out))
        return grads, new_stats, metrics

    def update_fn(state: TrainState, grads, new_stats) -> TrainState:
        if use_agc:
            grads = adaptive_clip_grad(state.params, grads)
        if config.model_type == 'se':
            mask = bundle.trainable_mask(state.params)
            grads = jax.tree.map(
                lambda g, m: g * jnp.float32(m), grads, mask)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats, opt_state=opt_state)

    return grad_fn, update_fn, optimizer


def make_train_step(bundle: ModelBundle, optimizer=None,
                    use_agc: Optional[bool] = None, jit: bool = True,
                    loss_fn=None):
    """Build the jitted train step (``jit=False`` returns the raw body for
    fusing into a larger XLA program).

    AGC applies to the model families built on the reference's CustomModel
    ('vad' and 'se'; the 'eff' family compiles a plain keras.Model —
    sj_train.py:401 — so it only gets the optimizer's clipvalue).
    """
    grad_fn, update_fn, optimizer = make_grad_update(
        bundle, optimizer, use_agc=use_agc, loss_fn=loss_fn)

    def train_step(state: TrainState, batch, rng):
        grads, new_stats, metrics = grad_fn(state.params, state.batch_stats,
                                            batch, rng)
        return update_fn(state, grads, new_stats), metrics

    return (jax.jit(train_step) if jit else train_step), optimizer


def make_eval_step(bundle: ModelBundle, jit: bool = True, loss_fn=None):
    """Validation step: inference-mode forward + loss + metrics
    (Keras ``validation_data`` semantics)."""
    config = bundle.config
    loss_fn = loss_fn or get_loss(config)
    metric_fns = metrics_lib.batch_metrics(config)

    def eval_step(state: TrainState, batch):
        x, y = batch
        out = bundle.apply(state.weights(), x, training=False)
        if getattr(loss_fn, 'needs_params', False):
            loss, parts = loss_fn(y, out, state.params)
        else:
            loss, parts = loss_fn(y, out)
        metrics = {'loss': loss, **parts}
        for name, fn in metric_fns.items():
            metrics[name] = fn(_first(y), _first(out))
        return metrics

    return jax.jit(eval_step) if jit else eval_step


def swa_update(state: TrainState) -> TrainState:
    """Fold the current weights into the SWA running average
    (reference: swa.py:36-44) — on device, no get_weights round-trip."""
    cnt = state.swa_count.astype(jnp.float32)

    def avg(swa_w, w):
        return (swa_w * cnt + w) / (cnt + 1.0)

    return state.replace(
        swa_params=jax.tree.map(avg, state.swa_params, state.params),
        swa_batch_stats=jax.tree.map(avg, state.swa_batch_stats,
                                     state.batch_stats),
        swa_count=state.swa_count + 1,
    )
