"""EfficientNet backbone + SED heads (reference: sj_train.py:340-401).

The reference instantiates Keras ``EfficientNetB{0..7}`` with ``weights=None``
(sj_train.py:341-342) — i.e. only the *architecture* is used, trained from
scratch. This is a clean-room flax implementation of that architecture
(Tan & Le, 2019: stem conv -> 7 MBConv stages with SE, width/depth scaled per
variant -> 1x1 head conv), NHWC channels-last so convs map directly onto TPU
conv/MXU units.

Deviation (documented): the Keras application's imagenet Rescaling(1/255)
front layer is omitted — inputs here are log-mel features, not uint8 images,
and with weights=None the layer is just a fixed affine map the first conv
absorbs.

Heads (reference: sj_train.py:344-401): transpose to time-major, flatten
freq x chan, optional gated Dense stack, then per-version decoders (v1
Conv1DTranspose x5, v3 bare, v5 time-resample + BiGRU, v6 BiGRU + FC stack,
v7 BiGRU gated by a tanh conv over the raw input), Dense n_classes + sigmoid.
``trainer.py:222-236`` uses the same backbone with a bare relu Dense head
(``head='density'``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from challenge_tpu.models.layers import BatchNorm, BiGRU, FullyConnectedLayer

# (width_coefficient, depth_coefficient) per variant B0..B7
SCALING = {
    0: (1.0, 1.0), 1: (1.0, 1.1), 2: (1.1, 1.2), 3: (1.2, 1.4),
    4: (1.4, 1.8), 5: (1.6, 2.2), 6: (1.8, 2.6), 7: (2.0, 3.1),
}

# kernel, repeats, filters_in, filters_out, expand_ratio, strides
BLOCK_ARGS = (
    (3, 1, 32, 16, 1, 1),
    (3, 2, 16, 24, 6, 2),
    (5, 2, 24, 40, 6, 2),
    (3, 3, 40, 80, 6, 2),
    (5, 3, 80, 112, 6, 1),
    (5, 4, 112, 192, 6, 2),
    (3, 1, 192, 320, 6, 1),
)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""
    kernel: int
    filters_in: int
    filters_out: int
    expand_ratio: int
    strides: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inputs = x
        dt = self.dtype
        filters = self.filters_in * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(filters, (1, 1), use_bias=False, dtype=dt)(x)
            x = BatchNorm(dt)(x, training)
            x = nn.swish(x)
        # depthwise
        x = nn.Conv(filters, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding='SAME',
                    feature_group_count=filters, use_bias=False, dtype=dt)(x)
        x = BatchNorm(dt)(x, training)
        x = nn.swish(x)
        # squeeze & excite
        if 0 < self.se_ratio <= 1:
            se_filters = max(1, int(self.filters_in * self.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.swish(nn.Conv(se_filters, (1, 1), dtype=dt)(se))
            se = nn.sigmoid(nn.Conv(filters, (1, 1), dtype=dt)(se))
            x = x * se.astype(x.dtype)
        # project
        x = nn.Conv(self.filters_out, (1, 1), use_bias=False, dtype=dt)(x)
        x = BatchNorm(dt)(x, training)
        if self.strides == 1 and self.filters_in == self.filters_out:
            if self.drop_rate > 0:
                # stochastic depth: drop whole residual branches per-sample
                x = nn.Dropout(self.drop_rate,
                               broadcast_dims=(1, 2, 3))(
                                   x, deterministic=not training)
            x = x + inputs
        return x


class EfficientNetBackbone(nn.Module):
    """EfficientNetB{model} with include_top=False: [B, H, W, C] ->
    [B, H/32, W/32, round_filters(1280)]."""
    model: int = 0
    drop_connect_rate: float = 0.2
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        width, depth = SCALING[self.model]
        dt = self.dtype
        x = x.astype(dt)
        # stem
        x = nn.Conv(round_filters(32, width), (3, 3), strides=(2, 2),
                    padding='SAME', use_bias=False, dtype=dt)(x)
        x = BatchNorm(dt)(x, training)
        x = nn.swish(x)
        # blocks
        total_blocks = sum(round_repeats(r, depth) for _, r, *_ in BLOCK_ARGS)
        b = 0
        for kernel, repeats, f_in, f_out, expand, strides in BLOCK_ARGS:
            f_in = round_filters(f_in, width)
            f_out = round_filters(f_out, width)
            for j in range(round_repeats(repeats, depth)):
                x = MBConv(kernel, f_in if j == 0 else f_out, f_out, expand,
                           strides if j == 0 else 1,
                           drop_rate=self.drop_connect_rate * b / total_blocks,
                           dtype=dt)(x, training)
                b += 1
        # head conv
        x = nn.Conv(round_filters(1280, width), (1, 1), use_bias=False,
                    dtype=dt)(x)
        x = BatchNorm(dt)(x, training)
        x = nn.swish(x)
        return x


class TimeAxisResample(nn.Module):
    """``Conv1D(target_len, 1, data_format='channels_first')``: a learned
    linear map over the *time* axis, per feature (reference: sj_train.py:379)."""
    target_len: int

    @nn.compact
    def __call__(self, x):  # [B, T, D] -> [B, target_len, D]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (x.shape[1], self.target_len))
        return jnp.einsum('btd,tn->bnd', x, w)


class EffNetSED(nn.Module):
    """EfficientNet SED family (reference: sj_train.py:340-401) and the
    density-head variant (reference: trainer.py:222-236) via head='density'."""
    model: int = 0
    v: int = 1
    n_classes: int = 3
    n_layers: int = 0
    n_dim: int = 256
    n_frame: int = 512
    n_mels: int = 80
    head: str = 'sed'          # 'sed' (sj_train) | 'density' (trainer)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        inputs = x
        dt = self.dtype
        out = EfficientNetBackbone(self.model, dtype=dt)(x, training)
        # [B, mel', T', C] -> [B, T', mel'*C] (reference: sj_train.py:344-345)
        out = out.transpose(0, 2, 1, 3)
        out = out.reshape(out.shape[0], out.shape[1], -1)

        for _ in range(self.n_layers):   # gated stack (sj_train.py:347-350)
            out = nn.Dense(self.n_dim, dtype=dt)(out)
            out = BatchNorm(dt)(out, training)
            out = nn.sigmoid(out) * out

        if self.head == 'density':       # reference: trainer.py:235
            return nn.relu(nn.Dense(self.n_classes, dtype=dt)(out)
                           ).astype(jnp.float32)

        if self.v == 1:                  # reference: sj_train.py:353-363
            for filters in (128, 64, 32, 16, 3):
                out = nn.ConvTranspose(filters, (2,), strides=(2,),
                                       dtype=dt)(out)
                out = nn.relu(out)
        elif self.v == 3:                # bare (sj_train.py:372-373)
            pass
        elif self.v == 5:                # reference: sj_train.py:377-382
            target = self.n_frame * 256 // 16000
            if out.shape[1] != target:
                out = TimeAxisResample(target)(out)
                out = BatchNorm(dt)(out, training)
                out = nn.relu(out)
            out = BiGRU(128, dtype=dt)(out)
        elif self.v == 6:                # reference: sj_train.py:383-387
            out = BiGRU(128, dtype=dt)(out)
            out = FullyConnectedLayer(256, use_bn=True, dtype=dt)(out, training)
            out = FullyConnectedLayer(128, use_bn=True, dtype=dt)(out, training)
            out = FullyConnectedLayer(64, use_bn=True, dtype=dt)(out, training)
        elif self.v == 7:                # reference: sj_train.py:388-393
            out = BiGRU(128, dtype=dt)(out)
            big = inputs.astype(dt).reshape(inputs.shape[0], self.n_mels, -1)
            big = nn.Conv(out.shape[-1], (16,), strides=(5,),
                          padding='SAME', dtype=dt)(big)
            big = nn.tanh(big)
            out = out * big
        else:                            # v2/v4 deprecated, others invalid
            raise ValueError(
                'version 2 is deprecated' if self.v == 2 else
                'version 4 is deprecated' if self.v == 4 else 'wrong version')

        out = nn.Dense(self.n_classes, dtype=dt)(out)
        return nn.sigmoid(out).astype(jnp.float32)
