"""The training loop — the functional ``model.fit``
(reference: sj_train.py:513-519).

One epoch = ``steps_per_epoch`` jitted train steps + ``validation_steps``
jitted eval steps. Batch synthesis, features, forward/backward, optimizer and
SWA all run inside XLA programs; the host only sequences epochs, aggregates
scalar logs, and runs callbacks — so TPUs never wait on a tf.data-style host
pipeline.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from challenge_tpu.models.registry import ModelBundle
from challenge_tpu.train.callbacks import Callback
from challenge_tpu.train.metrics import f1_from_counts
from challenge_tpu.train.state import (
    TrainState, init_state, make_eval_step, make_train_step)


class TrainLoop:
    """Owns the TrainState and drives epochs over device-batch iterators.

    Two modes:
    * iterator mode (default): ``fit(train_iter, ...)`` consumes
      (x, y) device batches, e.g. from a :class:`DevicePipeline`;
    * fused mode: pass ``banks``/``val_banks`` — each train step is ONE XLA
      program doing synthesis + features + fwd/bwd + optimizer, with
      ``config.steps_per_call`` steps scanned per dispatch. ``banks`` may be
      a :class:`~challenge_tpu.data.streaming.StreamingBanks` rotation for
      spec sets larger than device HBM (equal-shape chunks share the one
      compiled program; the next chunk uploads while the current trains).
    """

    def __init__(self, bundle: ModelBundle, state: Optional[TrainState] = None,
                 seed: int = 0, loss_fn=None, banks=None, val_banks=None,
                 mesh=None, variant: str = 'sj'):
        from challenge_tpu.data.streaming import StreamingBanks
        self.bundle = bundle
        self.config = bundle.config
        self.banks = banks
        self.val_banks = val_banks
        self.fused = banks is not None
        self.streaming = isinstance(banks, StreamingBanks)
        bank_shard = bool(getattr(self.config, 'bank_shard', False)) \
            and mesh is not None
        if self.streaming and bank_shard:
            raise ValueError(
                'streaming bank rotation and bank_shard are exclusive: '
                'sharded chunks would re-upload per-device slices every '
                'rotation — pick one capacity axis')
        if self.fused:
            from challenge_tpu.parallel.train import (
                make_fused_eval_step, make_fused_train_step)
            self.steps_per_call = max(
                int(getattr(self.config, 'steps_per_call', 1)), 1)
            self.train_step, self.optimizer = make_fused_train_step(
                bundle, self.config, mesh=mesh, variant=variant,
                steps_per_call=self.steps_per_call, loss_fn=loss_fn,
                bank_sharded=bank_shard)
            self.eval_step = make_fused_eval_step(bundle, self.config,
                                                  mesh=mesh, variant=variant,
                                                  loss_fn=loss_fn,
                                                  bank_sharded=bank_shard)
        else:
            if max(int(getattr(self.config, 'grad_accum', 1)), 1) > 1:
                raise ValueError(
                    'grad_accum > 1 needs fused banks mode (pass banks=): '
                    'iterator-mode batches arrive one at a time, so the '
                    'loop cannot scan microbatches inside the step')
            self.steps_per_call = 1
            self.train_step, self.optimizer = make_train_step(
                bundle, loss_fn=loss_fn)
            self.eval_step = make_eval_step(bundle, loss_fn=loss_fn)
        self.state = state if state is not None else init_state(
            bundle, jax.random.PRNGKey(seed), self.optimizer)
        if self.fused and mesh is not None:
            from challenge_tpu.parallel.mesh import (
                replicate, replicated, shard_banks)
            place = shard_banks if bank_shard else replicate
            self.state = replicate(self.state, mesh)
            if self.streaming:
                self.banks.set_placement(replicated(mesh))
            else:
                self.banks = place(self.banks, mesh)
            if self.val_banks is not None:
                self.val_banks = place(self.val_banks, mesh)
        self.stop_training = False
        self.history: List[dict] = []
        self._rng = jax.random.PRNGKey(seed + 17)

    def steps_per_fused_epoch(self, steps_per_epoch: int) -> int:
        """Optimizer steps one epoch actually advances: in fused mode the
        scan rounds UP to whole dispatches of ``steps_per_call`` steps
        (run_epoch: n_calls = ceil(steps/steps_per_call)). Resume logic
        must divide the restored step count by THIS, not steps_per_epoch,
        or epochs drift whenever steps_per_call does not divide it."""
        if not self.fused:
            return max(int(steps_per_epoch), 1)
        n_calls = max(-(-int(steps_per_epoch) // self.steps_per_call), 1)
        return n_calls * self.steps_per_call

    # Keras-model-like surface used by callbacks
    def set_weights(self, weights):
        # copy, don't alias: the incoming tree may BE this state's own SWA
        # buffers (SWA.on_train_end passes state.swa_weights()). If params
        # and swa_params shared buffers, the next fused train step — which
        # donates the whole TrainState — would hand XLA the same buffer
        # twice ('Attempt to donate the same buffer twice' crash on any
        # fit() after SWA finished).
        weights = jax.tree.map(jnp.array, weights)
        self.state = self.state.replace(params=weights['params'],
                                        batch_stats=weights['batch_stats'])

    def _prefix(self):
        # multi-output models log per-head metric names like Keras
        return 'class_' if self.bundle.multi_output else ''

    def _finalize(self, sums, count):
        logs = {}
        for k, v in sums.items():
            if k == 'f1_counts':
                logs[self._prefix() + 'f1_score'] = float(f1_from_counts(v))
            elif k in ('cos_sim', 'er'):
                logs[self._prefix() + k] = float(v / count)
            else:
                logs[k] = float(v / count)
        return logs

    def _epoch_keys(self, epoch: int, training: bool, n: int):
        """Per-epoch key stream derived from (seed, epoch, phase) — NOT a
        rolling split chain, so a resumed run's epoch k draws exactly the
        keys a never-preempted run would have drawn at epoch k (a rolling
        chain restarts at the head and replays the first epochs' batches
        after every preemption)."""
        base = jax.random.fold_in(self._rng, 2 * epoch + int(training))
        return jax.random.split(base, n)

    def run_epoch(self, data_iter, steps: int, training: bool,
                  epoch: int = 0):
        sums, count = {}, 0
        if self.fused:
            n_calls = max(-(-steps // self.steps_per_call), 1) \
                if training else steps
            keys = self._epoch_keys(epoch, training, n_calls)
            for i in range(n_calls):
                if training:
                    bk = self.banks.next_banks() if self.streaming \
                        else self.banks
                    self.state, metrics = self.train_step(
                        self.state, bk, keys[i])
                else:
                    vb = self.val_banks if self.val_banks is not None \
                        else (self.banks.peek() if self.streaming
                              else self.banks)
                    metrics = self.eval_step(self.state, vb, keys[i])
                for k, v in metrics.items():
                    acc = sums.get(k)
                    sums[k] = v if acc is None else acc + v
                count += 1
            return self._finalize(jax.device_get(sums), count)

        if training:   # one eager key derivation per epoch, not per step
            keys = self._epoch_keys(epoch, training, steps)
        for i in range(steps):
            batch = next(data_iter)
            if training:
                self.state, metrics = self.train_step(self.state, batch,
                                                      keys[i])
            else:
                metrics = self.eval_step(self.state, batch)
            for k, v in metrics.items():
                acc = sums.get(k)
                sums[k] = v if acc is None else acc + v
            count += 1
        sums = jax.device_get(sums)
        return self._finalize(sums, count)

    def fit(self, train_iter=None, epochs: int = 1, steps_per_epoch: int = 100,
            validation_iter=None, validation_steps: int = 16,
            callbacks: Sequence[Callback] = (), verbose: int = 1,
            initial_epoch: int = 0):
        """Reference defaults: 100 steps/epoch, 16 validation steps
        (sj_train.py:513-519). In fused mode ``train_iter``/``validation_iter``
        are unused (banks were given at construction); validation runs iff
        val_banks were provided. ``initial_epoch`` supports resuming a
        restored train state (epoch-indexed callbacks — LR schedule, SWA
        windows — continue from where the run left off)."""
        # per-RUN state (Keras resets both at the top of every fit): a stale
        # stop_training from a previous run's EarlyStopping/NaN would end a
        # reused loop after one epoch, and the returned history must cover
        # this run only (self.history keeps the cumulative record)
        self.stop_training = False
        if self.streaming:
            # exact resume for streamed corpora: the rotation cursor is a
            # pure function of the optimizer step (every fused dispatch
            # advances exactly steps_per_call steps), so syncing here makes
            # a restored train state continue the chunk schedule precisely
            # where the uninterrupted run would be. For a fresh loop (or a
            # reused one continuing its own run) this is the identity.
            self.banks.restore_cursor(int(self.state.step)
                                      // self.steps_per_call)
        run_history: List[dict] = []
        for cb in callbacks:
            cb.set_loop(self)
            cb.on_train_begin()
        train_it = iter(train_iter) if train_iter is not None else None
        val_it = iter(validation_iter) if validation_iter is not None else None
        validate = (val_it is not None) or (self.fused and
                                            self.val_banks is not None)

        for epoch in range(initial_epoch, epochs):
            t0 = time.time()
            for cb in callbacks:
                cb.on_epoch_begin(epoch)
            logs = self.run_epoch(train_it, steps_per_epoch, training=True,
                                  epoch=epoch)
            if validate:
                val_logs = self.run_epoch(val_it, validation_steps,
                                          training=False, epoch=epoch)
                logs.update({f'val_{k}': v for k, v in val_logs.items()})
            logs['time'] = time.time() - t0
            self.history.append(logs)
            run_history.append(logs)
            if verbose:
                msg = ' - '.join(f'{k}: {v:.4f}' for k, v in logs.items())
                print(f'Epoch {epoch + 1}/{epochs} - {msg}', flush=True)
            for cb in callbacks:
                cb.on_epoch_end(epoch, logs)
            if self.stop_training:
                break
        for cb in callbacks:
            cb.on_train_end()
        return run_history
