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
def save_weights(path: str, variables: Any):
    """Save {'params', 'batch_stats'} msgpack to ``path`` (.h5-named for
    run-name-grammar parity)."""
    data = serialization.to_bytes(jax.device_get(variables))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


def load_weights(path: str, target: Any):
    """Load weights saved by :func:`save_weights` into ``target``'s
    structure."""
    with open(path, 'rb') as f:
        return serialization.from_bytes(target, f.read())


# ----------------------------------------------------------- full train state
def save_train_state(ckpt_dir: str, state: TrainState, step: int = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(ckpt_dir)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def restore_train_state(ckpt_dir: str, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_dir),
                             item=jax.device_get(target))
    return jax.tree.map(lambda t, r: r, target, restored)
