"""Shared model building blocks (flax.linen).

Keras-parity notes: BatchNorm uses Keras defaults (momentum 0.99, epsilon
1e-3); convs are NHWC/'SAME' like the reference's channels-last Keras layers;
recurrent wrappers concatenate forward/backward passes like
``tf.keras.layers.Bidirectional``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _maybe_force_cminor_layout(x):
    """Measured layout experiment (NOTES.md 'Round-4 candidate work #1'),
    env-gated and off by default: XLA lays small-channel NHWC conv
    activations out batch-minor (batch in the 128-lane dim), leaving the
    conv emitter's channel dims at 48/128-96/128 lane occupancy. Setting
    ``CHALLENGE_TPU_FORCE_CMINOR_LAYOUT=1`` pins every small-channel conv
    activation to the standard channels-minor NHWC layout instead, so a
    step-time A/B can decide whether the emitter does better when the
    layout choice is taken away from it. Keep OFF unless measuring — the
    measured verdict lives in NOTES.md."""
    if not os.environ.get('CHALLENGE_TPU_FORCE_CMINOR_LAYOUT'):
        return x
    if x.ndim != 4 or x.shape[-1] >= 128:
        return x
    from jax.experimental.layout import Layout, with_layout_constraint
    return with_layout_constraint(
        x, Layout(major_to_minor=tuple(range(x.ndim))))


class BatchNorm(nn.Module):
    """Keras-default BatchNormalization (momentum 0.99, eps 1e-3).

    Statistics are always computed in float32 (``dtype`` only controls the
    output dtype) — the standard mixed-precision recipe."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # use_fast_variance (E[x^2]-E[x]^2 in one pass) is 50x+ faster than
        # the two-pass path under bf16 on TPU (measured 2.7s vs 49ms/step
        # for the vad v8 conv stack) and numerically fine at eps 1e-3
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=0.99, epsilon=1e-3, dtype=self.dtype,
            use_fast_variance=True)(x)


class ConvMPBlock(nn.Module):
    """num_convs x (Conv3x3 'SAME' -> [BN] -> ReLU) -> [MaxPool]
    (reference: sj_train.py:191-201)."""
    num_convs: int = 2
    fsize: int = 32
    kernel_size: int = 3
    pool_size: Sequence[int] = (2, 2)
    strides: Sequence[int] = (2, 2)
    use_bn: bool = False
    use_mp: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        for _ in range(self.num_convs):
            # a conv bias directly followed by BatchNorm is inert: BN
            # subtracts the batch mean (so the shift never reaches the
            # output) and the bias gradient is the channel-sum of BN's
            # zero-mean input gradient, i.e. 0 — dropping it removes two
            # full-activation HBM reduction passes per conv per step
            x = nn.Conv(self.fsize,
                        (self.kernel_size, self.kernel_size),
                        padding='SAME', use_bias=not self.use_bn,
                        dtype=self.dtype)(x)
            x = _maybe_force_cminor_layout(x)
            if self.use_bn:
                x = BatchNorm(self.dtype)(x, training)
            x = nn.relu(x)
        if self.use_mp:
            x = max_pool_same(x, tuple(self.pool_size), tuple(self.strides))
        return x


class FullyConnectedLayer(nn.Module):
    """Dense -> [BN] -> activation (reference: sj_train.py:204-211)."""
    nodes: int = 512
    act: Callable = nn.relu
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # bias before BN is inert (see ConvMPBlock)
        x = nn.Dense(self.nodes, use_bias=not self.use_bn,
                     dtype=self.dtype)(x)
        if self.use_bn:
            x = BatchNorm(self.dtype)(x, training)
        return self.act(x)


class BiLSTM(nn.Module):
    """Bidirectional LSTM, concat merge, return_sequences=True
    (reference: sj_train.py:252). Runs as two lax.scan passes."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.features, dtype=self.dtype))(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.features, dtype=self.dtype))(
            x, reverse=True, keep_order=True)
        return jnp.concatenate([fwd, bwd], axis=-1)


class BiGRU(nn.Module):
    """Bidirectional GRU, concat merge, return_sequences=True
    (reference: sj_train.py:382-389)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.GRUCell(self.features, dtype=self.dtype))(x)
        bwd = nn.RNN(nn.GRUCell(self.features, dtype=self.dtype))(
            x, reverse=True, keep_order=True)
        return jnp.concatenate([fwd, bwd], axis=-1)


def max_pool_same(x, window: Sequence[int], strides: Sequence[int]):
    """Keras-parity 'SAME' max pooling. XLA's select-and-scatter gradient is
    the fastest formulation measured on v5e for the batch-minor layouts the
    conv stack uses (3.4 ms/iter at [64,80,512,48] vs 5.3 ms for a
    slice-comparison custom VJP and 8.4 ms for a reshape-argmax one) — keep
    the native lowering."""
    return nn.max_pool(x, tuple(window), tuple(strides), padding='SAME')


def avg_pool_same(x, window: Sequence[int], strides: Sequence[int]):
    """Keras-style AveragePooling with 'SAME' padding: edge windows divide by
    the in-bounds element count, not the window size."""
    ones = jnp.ones_like(x)
    summed = nn.pool(x, 0., jnp.add, tuple(window), tuple(strides), 'SAME')
    counts = nn.pool(ones, 0., jnp.add, tuple(window), tuple(strides), 'SAME')
    return summed / counts
