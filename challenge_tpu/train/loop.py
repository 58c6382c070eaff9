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

from challenge_tpu.models.registry import ModelBundle
from challenge_tpu.train.callbacks import Callback
from challenge_tpu.train.metrics import f1_from_counts
from challenge_tpu.train.state import (
    TrainState, init_state, make_eval_step, make_train_step)


class TrainLoop:
    """Owns the TrainState and drives epochs over device-batch iterators."""

    def __init__(self, bundle: ModelBundle, state: Optional[TrainState] = None,
                 seed: int = 0, loss_fn=None):
        self.bundle = bundle
        self.config = bundle.config
        self.train_step, self.optimizer = make_train_step(bundle,
                                                          loss_fn=loss_fn)
        self.eval_step = make_eval_step(bundle, loss_fn=loss_fn)
        self.state = state if state is not None else init_state(
            bundle, jax.random.PRNGKey(seed), self.optimizer)
        self.stop_training = False
        self.history: List[dict] = []
        self._rng = jax.random.PRNGKey(seed + 17)

    # Keras-model-like surface used by callbacks
    def set_weights(self, weights):
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

    def run_epoch(self, data_iter, steps: int, training: bool):
        sums, count = {}, 0
        if training:   # one eager split per epoch, not per step
            keys = jax.random.split(self._rng, steps + 1)
            self._rng = keys[0]
        for i in range(steps):
            batch = next(data_iter)
            if training:
                self.state, metrics = self.train_step(self.state, batch,
                                                      keys[i + 1])
            else:
                metrics = self.eval_step(self.state, batch)
            for k, v in metrics.items():
                acc = sums.get(k)
                sums[k] = v if acc is None else acc + v
            count += 1
        sums = jax.device_get(sums)
        return self._finalize(sums, count)

    def fit(self, train_iter, epochs: int, steps_per_epoch: int,
            validation_iter=None, validation_steps: int = 16,
            callbacks: Sequence[Callback] = (), verbose: int = 1):
        """Reference defaults: 100 steps/epoch, 16 validation steps
        (sj_train.py:513-519)."""
        for cb in callbacks:
            cb.set_loop(self)
        train_it = iter(train_iter)
        val_it = iter(validation_iter) if validation_iter is not None else None

        for epoch in range(epochs):
            t0 = time.time()
            for cb in callbacks:
                cb.on_epoch_begin(epoch)
            logs = self.run_epoch(train_it, steps_per_epoch, training=True)
            if val_it is not None:
                val_logs = self.run_epoch(val_it, validation_steps,
                                          training=False)
                logs.update({f'val_{k}': v for k, v in val_logs.items()})
            logs['time'] = time.time() - t0
            self.history.append(logs)
            if verbose:
                msg = ' - '.join(f'{k}: {v:.4f}' for k, v in logs.items())
                print(f'Epoch {epoch + 1}/{epochs} - {msg}', flush=True)
            for cb in callbacks:
                cb.on_epoch_end(epoch, logs)
            if self.stop_training:
                break
        for cb in callbacks:
            cb.on_train_end()
        return self.history
