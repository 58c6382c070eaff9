"""Keras-style callbacks for the functional train loop
(reference: sj_train.py:489-503, swa.py, metrics.py:14-28).

Callbacks receive the :class:`~challenge_tpu.train.loop.TrainLoop` (which
owns the TrainState) and a ``logs`` dict of floats per epoch. Order matters
and mirrors the reference: SWA's ``on_train_end`` overwrites the live weights
with the SWA average *after* EarlyStopping may have restored the best
weights (reference: sj_train.py:489-500 callback order).
"""

from __future__ import annotations

import csv
import os
from typing import Callable

import numpy as np

from challenge_tpu.train import checkpoint
from challenge_tpu.train.optim import set_learning_rate
from challenge_tpu.train.state import swa_update


class NO_SWA_ERROR(Exception):
    """Raised when training ends before SWA ever triggered
    (reference: swa.py:5-10)."""

    def __init__(self, msg="Didn't use SWA") -> None:
        self.msg = msg

    def __str__(self) -> str:
        return self.msg


class Callback:
    loop = None

    def set_loop(self, loop):
        self.loop = loop

    def on_train_begin(self):
        pass

    def on_epoch_begin(self, epoch):
        pass

    def on_epoch_end(self, epoch, logs):
        pass

    def on_train_end(self, logs=None):
        pass


def _monitor_improved(value, best, mode):
    if mode == 'max':
        return value > best
    return value < best


class CSVLogger(Callback):
    """Append per-epoch logs to ``filename`` (reference: sj_train.py:490)."""

    def __init__(self, filename: str, append: bool = True):
        self.filename = filename
        self.append = append
        self._keys = None
        self._started = False   # truncation/header happen once per run

    def on_train_begin(self):
        # per RUN, not per object: a logger reused across two fit() calls
        # with append=False truncates again like Keras' does
        self._started = False

    def on_epoch_end(self, epoch, logs):
        logs = dict(logs)
        # Keras semantics: append=False truncates ONCE at the start of the
        # run and appends thereafter (not per epoch — that would leave only
        # the final epoch's row); append=True writes the header only when
        # the file doesn't already hold content.
        has_content = (os.path.exists(self.filename)
                       and os.path.getsize(self.filename) > 0)
        new_file = not self._started and not (self.append and has_content)
        self._started = True
        if self._keys is None:
            self._keys = sorted(logs)
        with open(self.filename, 'a' if not new_file else 'w',
                  newline='') as f:
            w = csv.writer(f)
            if new_file:
                w.writerow(['epoch'] + self._keys)
            w.writerow([epoch] + [logs.get(k, '') for k in self._keys])


class ModelCheckpoint(Callback):
    """Save best weights by ``monitor`` (reference: sj_train.py:492)."""

    def __init__(self, filepath: str, monitor: str = 'val_loss',
                 save_best_only: bool = True, mode: str = 'min',
                 verbose: int = 0, keras: bool = False):
        self.filepath = filepath
        self.monitor = monitor
        self.save_best_only = save_best_only
        self.mode = mode
        self.best = -np.inf if mode == 'max' else np.inf
        self.verbose = verbose
        self.keras = keras

    def on_epoch_end(self, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        if not self.save_best_only or _monitor_improved(
                value, self.best, self.mode):
            self.best = value
            checkpoint.save_weights(self.filepath, self.loop.state.weights(),
                                    bundle=self.loop.bundle,
                                    keras=self.keras)
            if self.verbose:
                print(f'\nEpoch {epoch}: {self.monitor} improved to '
                      f'{value:.5f}, saving to {self.filepath}')


class EarlyStopping(Callback):
    """Stop after ``patience`` epochs without improvement; optionally restore
    the best weights (reference: sj_train.py:495)."""

    def __init__(self, monitor: str = 'val_loss', patience: int = 10,
                 restore_best_weights: bool = True, mode: str = 'min'):
        self.monitor = monitor
        self.patience = patience
        self.restore = restore_best_weights
        self.mode = mode
        self.best = -np.inf if mode == 'max' else np.inf
        self.wait = 0
        self.best_weights = None

    def on_epoch_end(self, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        if _monitor_improved(value, self.best, self.mode):
            self.best = value
            self.wait = 0
            if self.restore:
                # host copy: device buffers may be donated by later steps
                import jax
                self.best_weights = jax.device_get(self.loop.state.weights())
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.loop.stop_training = True
                if self.restore and self.best_weights is not None:
                    self.loop.set_weights(self.best_weights)


class TerminateOnNaN(Callback):
    """Halt on NaN loss (reference: sj_train.py:493)."""

    def on_epoch_end(self, epoch, logs):
        loss = logs.get('loss')
        if loss is not None and not np.isfinite(loss):
            print(f'\nEpoch {epoch}: invalid loss, terminating training')
            self.loop.stop_training = True


class SWA(Callback):
    """Stochastic weight averaging (reference: swa.py:13-44): from
    ``start_epoch``, every ``swa_freq`` epochs fold the live weights into a
    running average kept on device; on train end, swap the average in
    (without recomputing BN statistics — the reference's 'Please Reset BN'
    behavior is preserved deliberately)."""

    def __init__(self, start_epoch: int, swa_freq: int = 1,
                 verbose: bool = True):
        self.start_epoch = start_epoch - 1
        self.swa_freq = swa_freq
        self.verbose = verbose

    def on_epoch_end(self, epoch, logs):
        rel = epoch - self.start_epoch
        if rel == 0 or (rel > 0 and rel % self.swa_freq == 0):
            if self.verbose:
                print('\nSaving Weights... ', epoch)
            self.loop.state = swa_update(self.loop.state)

    def on_train_end(self, logs=None):
        print('\nFinal Model Has Been Saved... Please Reset BN')
        if int(self.loop.state.swa_count) == 0:
            raise NO_SWA_ERROR()
        self.loop.set_weights(self.loop.state.swa_weights())


class LearningRateScheduler(Callback):
    """Set the LR at each epoch start (reference: sj_train.py:501-503)."""

    def __init__(self, schedule: Callable[[int], float], verbose: int = 0):
        self.schedule = schedule
        self.verbose = verbose

    def on_epoch_begin(self, epoch):
        lr = self.schedule(epoch)
        self.loop.state = self.loop.state.replace(
            opt_state=set_learning_rate(self.loop.state.opt_state, lr))
        if self.verbose:
            print(f'\nEpoch {epoch}: LearningRateScheduler setting lr to {lr}.')


class ReduceLROnPlateau(Callback):
    """Multiply LR by ``factor`` after ``patience`` epochs without
    improvement (reference: trainer.py:278-279)."""

    def __init__(self, monitor: str = 'loss', factor: float = 0.9,
                 patience: int = 5, mode: str = 'min', verbose: int = 0):
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = -np.inf if mode == 'max' else np.inf
        self.wait = 0

    def on_epoch_end(self, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        if _monitor_improved(value, self.best, self.mode):
            self.best = value
            self.wait = 0
            return
        self.wait += 1
        if self.wait >= self.patience:
            self.wait = 0
            opt_state = self.loop.state.opt_state
            lr = float(opt_state.hyperparams['learning_rate']) * self.factor
            self.loop.state = self.loop.state.replace(
                opt_state=set_learning_rate(opt_state, lr))


class EvalCallback(Callback):
    """Challenge-eval every 5th epoch (epoch % 5 == 2): evaluate the current
    best checkpoint on the dev wavs and keep the best-scoring weights as
    ``*_sample.h5`` (reference: metrics.py:14-28)."""

    def __init__(self, config, name: str, eval_dir: str = '.',
                 answer_path: str = 'sample_answer.json',
                 keras: bool = False):
        self.config = config
        self.name = name
        self.eval_dir = eval_dir
        self.answer_path = answer_path
        self.score = np.inf
        self.keras = keras

    def on_epoch_end(self, epoch, logs):
        if epoch % 5 != 2:
            return
        if not os.path.exists(self.name):
            return
        from challenge_tpu.evaluate import evaluate  # lazy: avoids cycle
        weights = checkpoint.load_weights(self.name,
                                          self.loop.state.weights(),
                                          bundle=self.loop.bundle)
        score = float(np.mean(evaluate(
            self.config, self.loop.bundle, weights,
            eval_dir=self.eval_dir, answer_path=self.answer_path,
            verbose=True)))
        logs['challenge_er'] = score
        if score <= self.score:
            self.score = score
            checkpoint.save_weights(
                os.path.splitext(self.name)[0] + '_sample.h5', weights,
                bundle=self.loop.bundle, keras=self.keras)


class TrainStateCheckpoint(Callback):
    """Preemption-safe periodic full-state checkpoint (params + optimizer
    state + SWA average + step) via Orbax — resume with
    ``restore_train_state`` (a TPU-native addition; the reference persists
    weights only, SURVEY §5.4)."""

    def __init__(self, ckpt_dir: str, every_epochs: int = 10):
        self.ckpt_dir = ckpt_dir
        self.every = max(every_epochs, 1)

    def on_epoch_end(self, epoch, logs):
        if (epoch + 1) % self.every == 0:
            checkpoint.save_train_state(self.ckpt_dir, self.loop.state)

    def on_train_end(self, logs=None):
        checkpoint.save_train_state(self.ckpt_dir, self.loop.state)


class TensorBoard(Callback):
    """Scalar logging to TensorBoard event files (reference: sj_train.py:494).
    Degrades to a no-op when no event-writer backend is available — but says
    so once on stdout, so a misconfigured log dir or missing backend can't
    silently lose a run's observability."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = None
        self._warned_write = False
        try:
            from flax.metrics import tensorboard as ftb
            self._writer = ftb.SummaryWriter(log_dir)
        except Exception as e:
            print(f'WARNING: TensorBoard logging disabled '
                  f'(writer for {log_dir!r} failed: {e!r})')
            self._writer = None

    def on_epoch_end(self, epoch, logs):
        if self._writer is None:
            return
        for k, v in logs.items():
            try:
                self._writer.scalar(k, float(v), epoch)
            except Exception as e:
                if not self._warned_write:
                    self._warned_write = True
                    print(f'WARNING: TensorBoard scalar write failed '
                          f'({k}={v!r}: {e!r}); further failures silenced')
        self._writer.flush()
