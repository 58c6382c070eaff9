"""Device mesh and sharding utilities.

The reference is strictly single-device (SURVEY §2: device selection is
``CUDA_VISIBLE_DEVICES`` only — sj_train.py:408). The TPU-native scale-out
path is pure data parallelism over a 1-D ``jax.sharding.Mesh``: the models
are small CNN/CRNNs (no attention, no MoE), so tensor/pipeline/expert
parallelism has nothing to shard — the win is sharding the batch (and the
eval window batch) across chips with gradient psums riding ICI
(BASELINE config 5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = 'batch'


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (0 = all visible)."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host/global batch so its leading axis is split across the
    mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
