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


def mesh_for_config(config):
    """The training CLIs' mesh policy: a DP mesh over ``config.n_devices``
    devices (0 = all visible) when more than one is available AND the global
    batch divides them; otherwise None (single-device). The reference's
    defaults (batch 12) do not divide a v5e-8, so an explicit batch bump is
    what opts a run into multi-chip — matching its single-GPU behavior
    unless the user asks for scale."""
    avail = len(jax.devices())
    n = config.n_devices if config.n_devices > 0 else avail
    n = min(n, avail)
    bank_shard = bool(getattr(config, 'bank_shard', False))
    if n <= 1:
        if bank_shard and avail > 1:
            raise ValueError(
                'bank_shard needs a multi-device mesh but n_devices caps it '
                f'at {n}; raise --n_devices (devices available: {avail})')
        if bank_shard:
            print('bank_shard has no effect on a single device: the full '
                  'banks stay resident (use --stream_chunks for datasets '
                  'larger than HBM)', flush=True)
        return None
    if config.batch_size % n != 0:
        if bank_shard:
            # silently replicating would defeat the capacity feature the
            # flag asks for (and likely OOM) — fail with the actual cause
            raise ValueError(
                f'bank_shard requires a multi-device mesh, but batch_size '
                f'{config.batch_size} does not divide the {n} devices — '
                'pick a divisible batch (or drop --bank_shard)')
        print(f'batch_size {config.batch_size} does not divide {n} devices;'
              ' training single-device (pick a divisible batch to scale)',
              flush=True)
        return None
    return make_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _pad_leading_cyclic(tree, n: int):
    """Pad every leaf's leading axis to a multiple of ``n`` by repeating
    items cyclically (index i holds item i % N). All leaves must share the
    same leading length (a bank and its aligned side arrays).

    Host (numpy) leaves are padded with numpy — a jnp.take would commit a
    full-size copy to the default device, exactly the device-0
    materialization host-built banks exist to avoid."""
    import jax.numpy as jnp
    leaves = jax.tree.leaves(tree)
    n_items = leaves[0].shape[0]
    n_pad = -(-n_items // n) * n
    if n_pad == n_items:
        return tree
    idx = np.arange(n_pad) % n_items

    def pad(x):
        if isinstance(x, np.ndarray):
            return np.take(x, idx, axis=0)
        return jnp.take(x, jnp.asarray(idx), axis=0)

    return jax.tree.map(pad, tree)


def shard_banks(banks, mesh: Mesh):
    """Split the source banks' clip axis across the mesh.

    The reference holds the whole spec set in one process's RAM
    (utils.py:88-94); replicated device banks cap the dataset at one chip's
    HBM. Sharding the clip axis makes capacity scale with the mesh: device d
    holds the d-th contiguous block of each bank and synthesizes its batch
    shard from that local block only (no collective touches bank data — the
    only mesh traffic stays the gradient psum). Per-device draws use the
    step key folded with the device index, so shards sample independently.

    Semantics vs replicated banks: per-item long-run draw frequencies stay
    uniform, but one example's sources always come from a single shard (the
    reference's global shuffle can mix any voices). Banks whose item count
    does not divide the mesh are padded by repeating items cyclically —
    padded duplicates are drawn ~2x as often; keep counts divisible by the
    device count for exactly-uniform sampling.

    For the capacity scaling to be real, pass banks built with
    ``build_banks(host=True)`` (the CLIs do this under --bank_shard):
    numpy leaves are padded host-side and device_put places each device's
    shard directly. Device-built banks still shard correctly, but they
    were already fully materialized on the default device — fine for
    tests/small sets, no capacity win.
    """
    from challenge_tpu.data.mixture import Banks
    n = int(mesh.devices.size)
    bg = _pad_leading_cyclic(banks.backgrounds, n)
    # voices and their labels are index-aligned: pad them together
    voices, voice_labels = _pad_leading_cyclic(
        (banks.voices, banks.voice_labels), n)
    noises = (_pad_leading_cyclic(banks.noises, n)
              if banks.noises is not None else None)
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh),
                        Banks(bg, voices, voice_labels, noises))


def shard_batch(batch, mesh: Mesh):
    """Place a host/global batch so its leading axis is split across the
    mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
