"""Spectrogram-domain augmentations with explicit PRNG keys.

Parity targets (reference file:line):
* mask (SpecAugment)      transforms.py:12-40
* random_shift            transforms.py:43-47
* random_merge_aug        data_utils.py:100-117
* stft_filter             data_utils.py:126-136
* specaugment (time+freq) data_utils.py:58-61 (``augment``)

The reference draws from TF's global RNG inside tf.while loops; here every
random op takes a ``jax.random`` key, making augmentation deterministic by
construction and fully jittable/vmappable (no data-dependent shapes: masks are
built with iota comparisons instead of concat of dynamic-length pieces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_iota(shape, axis):
    """Broadcastable index array along ``axis`` of ``shape``."""
    n = shape[axis]
    view = [1] * len(shape)
    view[axis] = n
    return jnp.arange(n).reshape(view)


def mask(key, specs, axis: int, max_mask_size=None, n_mask: int = 1):
    """Zero ``n_mask`` random spans along ``axis`` (reference: transforms.py:12-40).

    Per mask: size ~ U{0..max_mask_size-1}, offset ~ U{0..total-size-1}.
    """
    total = specs.shape[axis]
    if max_mask_size is None:
        max_mask_size = total
    idx = _axis_iota(specs.shape, axis)

    def body(i, carry):
        m, k = carry
        k, k_size, k_off = jax.random.split(k, 3)
        size = jax.random.randint(k_size, (), 0, max_mask_size)
        u = jax.random.uniform(k_off, ())
        offset = jnp.floor(u * (total - size).astype(jnp.float32)).astype(jnp.int32)
        keep = jnp.logical_or(idx < offset, idx >= offset + size)
        return m * keep.astype(specs.dtype), k

    ones = jnp.ones_like(idx, dtype=specs.dtype)
    m, _ = jax.lax.fori_loop(0, n_mask, body, (ones, key))
    return specs * m


def random_shift(key, specs, axis: int = 0, width: int = 16):
    """Pad ``width`` both sides along ``axis`` then random-crop back
    (reference: transforms.py:43-47): a uniform shift in [-width, width] with
    zero fill."""
    offset = jax.random.randint(key, (), 0, 2 * width + 1)
    shift = offset - width  # out[j] = specs[j + shift]
    idx = _axis_iota(specs.shape, axis) + shift
    valid = (idx >= 0) & (idx < specs.shape[axis])
    gathered = jnp.take(specs, jnp.clip(idx.reshape(-1), 0, specs.shape[axis] - 1),
                        axis=axis)
    return gathered * valid.astype(specs.dtype)


def batch_mask_keep(key, b: int, total: int, max_mask_size: int,
                    n_mask: int = 1, dtype=jnp.float32):
    """Per-sample keep masks [B, total] for ``n_mask`` random spans — the
    mask-generation half of :func:`batch_mask`, exposed so callers with
    non-standard physical layouts (e.g. the channel-major flat magnitude)
    can draw the exact same mask distribution and apply it themselves."""
    k_size, k_off = jax.random.split(key)
    sizes = jax.random.randint(k_size, (b, n_mask), 0, max_mask_size)
    u = jax.random.uniform(k_off, (b, n_mask))
    offsets = jnp.floor(u * (total - sizes).astype(jnp.float32)
                        ).astype(jnp.int32)
    idx = jnp.arange(total)[None, None, :]                    # [1, 1, T]
    keep = (idx < offsets[..., None]) | (idx >= (offsets + sizes)[..., None])
    return jnp.min(keep.astype(dtype), axis=1)                # [B, total]


def batch_mask(key, specs, axis: int, max_mask_size: int, n_mask: int = 1):
    """Batched SpecAugment masks: per-sample random spans along ``axis``
    for a whole batch in one shot (same per-sample distribution as
    :func:`mask`, reference: transforms.py:12-40, but with no loops or vmap —
    all masks materialize as one broadcast comparison, which compiles orders
    of magnitude faster and runs as a single fused VPU op).

    specs: [B, ...]; axis is the masked axis (may be negative).
    """
    b = specs.shape[0]
    axis = axis % specs.ndim
    total = specs.shape[axis]
    m = batch_mask_keep(key, b, total, max_mask_size, n_mask, specs.dtype)
    shape = [b] + [1] * (specs.ndim - 1)
    shape[axis] = total
    return specs * m.reshape(shape)


def batch_specaugment(key, specs, time_axis: int = -2, freq_axis: int = -3):
    """Batched time (6 x up to 24) + freq (1 x up to 16) masking
    (reference: data_utils.py:58-61 applied per-sample pre-batch)."""
    k_t, k_f = jax.random.split(key)
    specs = batch_mask(k_t, specs, axis=time_axis, max_mask_size=24, n_mask=6)
    specs = batch_mask(k_f, specs, axis=freq_axis, max_mask_size=16, n_mask=1)
    return specs


def specaugment(key, specs, labels=None, time_axis: int = -2,
                freq_axis: int = -3):
    """Time masks (6 x up to 24) + one freq mask (up to 16)
    (reference: data_utils.py:58-61)."""
    k_t, k_f = jax.random.split(key)
    specs = mask(k_t, specs, axis=time_axis, max_mask_size=24, n_mask=6)
    specs = mask(k_f, specs, axis=freq_axis, max_mask_size=16, n_mask=1)
    if labels is None:
        return specs
    return specs, labels


def random_merge_aug(number: int):
    """Random convex-combination channel augmentation to ``number`` channels
    (reference: data_utils.py:100-117). Returned closure takes (key, x[, y])."""

    def _random_merge_aug(key, x, y=None):
        chan = x.shape[-1] // 2
        if chan != 2:
            raise ValueError('This augment can be used in 2 channel audio')
        real = x[..., :chan]
        imag = x[..., chan:]
        factor = jax.random.uniform(key, (1, 1, number - chan),
                                    minval=0.1, maxval=0.9)
        aug_real = (factor * jnp.repeat(real[..., :1], number - chan, -1)
                    + jnp.sqrt(1 - factor)
                    * jnp.repeat(real[..., 1:], number - chan, -1))
        real = jnp.concatenate([real, aug_real], -1)
        imag = jnp.concatenate(
            [imag, jnp.repeat(imag[..., :1] + imag[..., 1:], number - chan, -1)],
            -1)
        out = jnp.concatenate([real, imag], -1)
        if y is not None:
            return out, y
        return out
    return _random_merge_aug


def batch_random_merge_aug(number: int):
    """Batched :func:`random_merge_aug` with one INDEPENDENT factor draw
    per sample (the reference applies the augment in a per-example tf.data
    map before batching, so a batch carries batch_size independent
    U(0.1, 0.9) draws). Returned closure takes (key, x [B, ...])."""
    merge = random_merge_aug(number)

    def _batch(key, x):
        return jax.vmap(merge)(jax.random.split(key, x.shape[0]), x)
    return _batch


def stft_filter(filter_num: int, freq_axis=None):
    """Zero STFT rows 1..filter_num (a crude high-pass keeping DC; reference:
    data_utils.py:126-136). Returned closure takes (x[, y]).

    ``freq_axis`` defaults to the reference layout (axis 0 unbatched, -3
    batched); pass -2 for time-major ('tfc') spectrograms."""

    def _stft_filter(x, y=None):
        if freq_axis is not None:
            axis = freq_axis % x.ndim
        else:
            axis = 0 if x.ndim == 3 else x.ndim - 3
        idx = _axis_iota(x.shape, axis)
        keep = jnp.logical_or(idx < 1, idx >= filter_num + 1)
        x = x * keep.astype(x.dtype)
        if y is None:
            return x
        return x, y
    return _stft_filter
