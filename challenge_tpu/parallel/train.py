"""Sharded and fused training steps.

``make_sharded_train_step``: the train step jitted over a mesh with the
batch sharded on the data axis and the state replicated — XLA inserts the
gradient all-reduce (psum over ICI) automatically from the sharding
constraints; there is no hand-written collective (scaling-book recipe:
pick a mesh, annotate shardings, let XLA place collectives).

``make_fused_train_step``: the flagship program — mixture synthesis from
HBM-resident banks, STFT-as-GEMM log-mel features, SpecAugment, the model
forward/backward, AGC, optimizer and metrics, all in ONE XLA program per
step, sharded over the mesh. The reference spreads this across a host-side
tf.data pipeline + a GPU train step (SURVEY §3.1); here the accelerator
never waits on the host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from challenge_tpu.config import Config
from challenge_tpu.data.mixture import Banks
from challenge_tpu.data.pipeline import make_feature_fn
from challenge_tpu.models.registry import ModelBundle
from challenge_tpu.parallel.mesh import BATCH_AXIS, batch_sharding, replicated
from challenge_tpu.train.state import (
    make_eval_step, make_grad_update, make_train_step)

try:  # jax >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _fused_compiler_options():
    """Best measured libtpu options for the fused train step.

    A 12-config sweep on v5e (scripts/flag_sweep.py; table in NOTES.md)
    found exactly one knob that moves the conv-dominated step:
    ``xla_tpu_scoped_vmem_limit_kib=65536`` — 70.7 -> 68.1 ms at vad v8
    B=128 bf16 (+3.7%); 32 MiB regresses, 96 MiB adds nothing more. TPU
    only: other backends reject unknown options. Set
    ``CHALLENGE_TPU_NO_COMPILER_OPTS=1`` to disable (e.g. on a TPU
    generation where the measured v5e value is wrong)."""
    import os
    if os.environ.get('CHALLENGE_TPU_NO_COMPILER_OPTS'):
        return None
    try:
        if jax.default_backend() == 'tpu':
            return {'xla_tpu_scoped_vmem_limit_kib': '65536'}
    except Exception:  # pragma: no cover - uninitializable backend
        pass
    return None


def make_sharded_feature_fn(config: Config, mesh: Mesh, training: bool = True,
                            variant: str = 'sj', use_pallas=None,
                            bank_sharded: bool = False):
    """(key, banks) -> (x, y) with per-device synthesis under ``shard_map``.

    The SPMD partitioner cannot split a ``pallas_call`` across devices, but it
    never has to: synthesis is embarrassingly batch-parallel, so each device
    runs the full Pallas DMA kernel on its own batch shard (banks are
    replicated read-only gather sources). The per-device PRNG key is the
    global key folded with the device's mesh position, so shards draw
    independent mixtures. Returns None when the batch does not divide the
    mesh (caller falls back to the globally-partitioned XLA scatter path).

    bank_sharded: the banks' clip axis is split across the mesh (see
    ``parallel.mesh.shard_banks``) — each device synthesizes from its local
    shard only, so the dataset HBM footprint scales with the device count.
    """
    n_dev = int(mesh.devices.size)
    if config.batch_size % n_dev != 0:
        return None
    local = dataclasses.replace(config,
                                batch_size=config.batch_size // n_dev)
    local_fn = make_feature_fn(local, training=training, variant=variant,
                               jit=False, use_pallas=use_pallas)

    def per_device(key, banks):
        key = jax.random.fold_in(key, jax.lax.axis_index(BATCH_AXIS))
        return local_fn(key, banks)

    # check_vma=False: the body has no collectives and is never
    # differentiated through (features are data), but its internal lax.scan
    # carries would all need manual pvary annotations to satisfy the
    # varying-axes type check
    bank_spec = P(BATCH_AXIS) if bank_sharded else P()
    return shard_map(per_device, mesh=mesh, in_specs=(P(), bank_spec),
                     out_specs=P(BATCH_AXIS), check_vma=False)


def make_sharded_train_step(bundle: ModelBundle, mesh: Mesh, optimizer=None):
    """(state, batch, rng) -> (state, metrics), batch sharded over the mesh's
    data axis, state replicated."""
    step, optimizer = make_train_step(bundle, optimizer, jit=False)
    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)
    jitted = jax.jit(
        step,
        in_shardings=(r_sh, (b_sh, b_sh), r_sh),
        out_shardings=(r_sh, r_sh),
    )
    return jitted, optimizer


def make_fused_train_step(bundle: ModelBundle, config: Config,
                          mesh: Optional[Mesh] = None, optimizer=None,
                          training: bool = True, variant: str = 'sj',
                          steps_per_call: Optional[int] = None,
                          use_pallas=None, loss_fn=None,
                          bank_sharded: bool = False):
    """(state, banks, key) -> (state, metrics): synthesis + features + train
    step fused into one XLA program.

    With a mesh, synthesis runs per-device under ``shard_map`` (the Pallas
    DMA kernel on a TPU backend — one kernel per device over the local batch
    shard) so the batch is born sharded on the data axis; every downstream
    op (features, forward, backward) is partitioned and the grad reduction
    becomes a psum over ICI. Banks are replicated (read-only gather sources).
    If the batch does not divide the mesh, falls back to globally-partitioned
    XLA synthesis with a sharding constraint on the batch.

    bank_sharded: the banks passed at call time were placed with
    ``parallel.mesh.shard_banks`` — their clip axis is split across the
    mesh and each device synthesizes from its local shard, so the dataset
    HBM footprint scales with the device count. Requires a mesh and a batch
    that divides it (there is no globally-partitioned fallback: a global
    gather over a sharded bank would silently all-gather the dataset).

    ``steps_per_call > 1`` (default from config.steps_per_call) runs that
    many optimizer steps inside one host dispatch via ``lax.scan``; metrics
    come back averaged over the scanned steps.

    ``config.grad_accum > 1`` scans that many synthesize+forward+backward
    microbatches (each of ``config.batch_size``) per optimizer step,
    averaging the gradients before ONE AGC + optimizer apply — an effective
    batch of ``grad_accum * batch_size`` at the activation memory of one
    microbatch (the TPU lever when even remat can't fit the target batch).
    BatchNorm batch statistics are per-microbatch, threaded sequentially
    through the moving averages, exactly like k consecutive Keras steps;
    metrics come back averaged over microbatches.
    """
    if bank_sharded and mesh is None:
        raise ValueError('bank_sharded requires a mesh')
    sharded_feature_fn = None
    if mesh is not None:
        sharded_feature_fn = make_sharded_feature_fn(
            config, mesh, training=training, variant=variant,
            use_pallas=use_pallas, bank_sharded=bank_sharded)
    if sharded_feature_fn is not None:
        feature_fn = sharded_feature_fn
    else:
        if bank_sharded:
            raise ValueError(
                'bank_sharded requires batch_size divisible by the mesh '
                f'({config.batch_size} % {int(mesh.devices.size)} != 0)')
        feature_fn = make_feature_fn(
            config, training=training, variant=variant, jit=False,
            use_pallas=(False if mesh is not None else use_pallas))
    grad_fn, update_fn, optimizer = make_grad_update(bundle, optimizer,
                                                     loss_fn=loss_fn)
    if steps_per_call is None:
        steps_per_call = max(int(getattr(config, 'steps_per_call', 1)), 1)
    grad_accum = max(int(getattr(config, 'grad_accum', 1)), 1)

    def features(key, banks):
        batch = feature_fn(key, banks)
        # materialize the batch before the model consumes it: without this
        # barrier XLA fuses the synthesis/feature producers into every
        # consumer (forward AND backward), recomputing the whole pipeline
        # many times (~30x slower measured on v5e)
        batch = jax.lax.optimization_barrier(batch)
        if mesh is not None:
            sh = batch_sharding(mesh)
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, sh), batch)
        return batch

    def one(state, banks, key):
        k_data, k_model = jax.random.split(key)
        if grad_accum == 1:
            grads, new_stats, metrics = grad_fn(
                state.params, state.batch_stats, features(k_data, banks),
                k_model)
            return update_fn(state, grads, new_stats), metrics

        def micro(carry, j):
            stats, grad_sum = carry
            batch = features(jax.random.fold_in(k_data, j), banks)
            grads, stats, metrics = grad_fn(
                state.params, stats, batch, jax.random.fold_in(k_model, j))
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            return (stats, grad_sum), metrics

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, grad_sum), metrics = jax.lax.scan(
            micro, (state.batch_stats, zeros), jnp.arange(grad_accum))
        grads = jax.tree.map(lambda g: g / grad_accum, grad_sum)
        new_state = update_fn(state, grads, new_stats)
        return new_state, jax.tree.map(lambda m: jnp.mean(m, axis=0),
                                       metrics)

    def fused(state, banks: Banks, key):
        if steps_per_call == 1:
            return one(state, banks, key)
        keys = jax.random.split(key, steps_per_call)
        state, metrics = jax.lax.scan(
            lambda s, k: one(s, banks, k), state, keys)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

    opts = _fused_compiler_options()
    if mesh is not None:
        r_sh = replicated(mesh)
        bank_sh = batch_sharding(mesh) if bank_sharded else r_sh
        return jax.jit(fused,
                       in_shardings=(r_sh, bank_sh, r_sh),
                       out_shardings=(r_sh, r_sh),
                       donate_argnums=(0,),
                       compiler_options=opts), optimizer
    # donate the TrainState: params/opt-state buffers update in place
    return jax.jit(fused, donate_argnums=(0,), compiler_options=opts), \
        optimizer


def make_fused_eval_step(bundle: ModelBundle, config: Config,
                         mesh: Optional[Mesh] = None, variant: str = 'sj',
                         use_pallas=None, loss_fn=None,
                         bank_sharded: bool = False):
    """(state, banks, key) -> metrics: validation batch synthesis + eval-mode
    forward + loss/metrics in one program (Keras validation_data analogue
    over the test banks). ``bank_sharded`` as in make_fused_train_step."""
    if bank_sharded and mesh is None:
        raise ValueError('bank_sharded requires a mesh')
    feature_fn = None
    if mesh is not None:
        feature_fn = make_sharded_feature_fn(
            config, mesh, training=False, variant=variant,
            use_pallas=use_pallas, bank_sharded=bank_sharded)
    if feature_fn is None:
        if bank_sharded:
            raise ValueError(
                'bank_sharded requires batch_size divisible by the mesh '
                f'({config.batch_size} % {int(mesh.devices.size)} != 0)')
        feature_fn = make_feature_fn(
            config, training=False, variant=variant, jit=False,
            use_pallas=(False if mesh is not None else use_pallas))
    step = make_eval_step(bundle, jit=False, loss_fn=loss_fn)

    def fused(state, banks: Banks, key):
        batch = feature_fn(key, banks)
        batch = jax.lax.optimization_barrier(batch)
        if mesh is not None:
            sh = batch_sharding(mesh)
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, sh), batch)
        return step(state, batch)

    if mesh is not None:
        r_sh = replicated(mesh)
        bank_sh = batch_sharding(mesh) if bank_sharded else r_sh
        return jax.jit(fused, in_shardings=(r_sh, bank_sh, r_sh),
                       out_shardings=r_sh)
    return jax.jit(fused)


def make_sharded_eval_step(bundle: ModelBundle, mesh: Mesh):
    step = make_eval_step(bundle, jit=False)
    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)
    return jax.jit(step,
                   in_shardings=(r_sh, (b_sh, b_sh)),
                   out_shardings=r_sh)
