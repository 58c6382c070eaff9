"""Checkpointing.

Weight artifacts keep the reference's three-file convention —
``{run}.h5`` (best), ``{run}_SWA.h5``, ``{run}_sample.h5``
(reference: sj_train.py:492,521; metrics.py:28) — stored as flax msgpack
under the familiar names so the run-name grammar stays round-trippable.

Full training state (params + batch_stats + optimizer state + SWA average +
step), which the reference never persists (SURVEY §5.4), is saved with
Orbax for true preemption-safe resume — the TPU-native upgrade.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization

from challenge_tpu.train.state import TrainState


# ----------------------------------------------------------- weight artifacts
def save_weights(path: str, variables: Any, bundle=None,
                 keras: bool = False):
    """Save {'params', 'batch_stats'} to ``path``. Default: flax msgpack
    (.h5-named for run-name-grammar parity). With ``keras=True`` (and the
    ModelBundle passed), write a REAL Keras legacy HDF5 file instead —
    loadable by the reference's own ``model.load_weights`` (and by
    :func:`load_weights` here, which auto-detects the format)."""
    if keras:
        if bundle is None:
            raise ValueError('keras=True export needs the model bundle')
        from challenge_tpu.interop.keras_h5 import save_keras_h5_variables
        tmp = path + '.tmp'
        save_keras_h5_variables(bundle, jax.device_get(variables), tmp)
        os.replace(tmp, path)
        return
    data = serialization.to_bytes(jax.device_get(variables))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


_HDF5_MAGIC = b'\x89HDF\r\n\x1a\n'


def load_weights(path: str, target: Any, bundle=None):
    """Load weights saved by :func:`save_weights` into ``target``'s
    structure. A file that is a REAL Keras HDF5 checkpoint (reference-era
    ``model.save_weights`` output — detected by the HDF5 magic, our msgpack
    artifacts only borrow the .h5 name) is routed through the Keras
    importer instead; pass ``bundle`` (the ModelBundle) to enable that."""
    with open(path, 'rb') as f:
        head = f.read(8)
        if head == _HDF5_MAGIC:
            if bundle is None:
                raise ValueError(
                    f'{path!r} is a Keras HDF5 checkpoint; pass the model '
                    'bundle so it can be imported '
                    '(challenge_tpu.interop.keras_h5)')
            from challenge_tpu.interop.keras_h5 import load_keras_h5_variables
            return load_keras_h5_variables(bundle, path)
        return serialization.from_bytes(target, head + f.read())


# ----------------------------------------------------------- full train state
def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_train_state(ckpt_dir: str, state: TrainState, step: int = None,
                     max_to_keep: int = 3):
    """Step-suffixed checkpoint under ``ckpt_dir/<step>`` with retention of
    the last ``max_to_keep`` steps (a corrupt final write can no longer lose
    the whole run). ``step`` defaults to the state's own step counter."""
    import orbax.checkpoint as ocp
    if step is None:
        step = int(state.step)
    with _manager(ckpt_dir, max_to_keep) as mgr:
        # device_get is NOT incidental: the fused train step donates the
        # TrainState's buffers (donate_argnums), so handing live device
        # arrays to an async Orbax save would race the next step's
        # donation. The host copy decouples the save from training; the
        # explicit wait keeps save->restore sequences (tests, preemption
        # handlers) deterministic.
        mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        mgr.wait_until_finished()


def checkpoint_steps(ckpt_dir: str):
    """Steps with a retained checkpoint, ascending."""
    with _manager(ckpt_dir) as mgr:
        return sorted(mgr.all_steps())


def restore_train_state(ckpt_dir: str, target: TrainState,
                        step: int = None) -> TrainState:
    """Restore the checkpoint at ``step`` (default: latest retained)."""
    import orbax.checkpoint as ocp
    with _manager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoints under {ckpt_dir}')
        try:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(jax.device_get(target)))
        except (ValueError, KeyError, TypeError) as e:
            # a checkpoint that EXISTS but does not match the live pytree is
            # not a "start fresh" situation (that could silently discard a
            # long run) — fail with a diagnosis instead of Orbax internals.
            # Known cause: sgd/rmsprop optimizer states changed structure
            # when the stacks became exact-Keras (see NOTES.md).
            raise ValueError(
                f'checkpoint at {ckpt_dir!r} step {step} does not match the '
                'current train-state structure (saved with a different '
                'model/optimizer version? sgd/rmsprop states changed when '
                f'the optimizers became exact-Keras): {e}') from e
    return jax.tree.map(lambda t, r: r, target, restored)
