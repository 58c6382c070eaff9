"""VAD CRNN model family (reference: sj_train.py:214-255, ``define_keras_model``).

VGG-style CNN over [B, n_mels, n_frame, n_chan] log-mel inputs, then a
time-major MLP head. Version switches (reference line numbers):
  v6: temporal avg+max smoothing pools inside the conv stack (225-229)
  v7: 1-3-1 bottleneck residual before each later ConvMPBlock (230-241)
  v8: wider base filters (48 instead of 32) (216-217)
  v9: extra FC 512 + BiLSTM-128 in the head (247-252)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from challenge_tpu.models.layers import (
    BatchNorm, BiLSTM, ConvMPBlock, FullyConnectedLayer, avg_pool_same)


class VADModel(nn.Module):
    """``define_keras_model`` parity. ``final_act`` is sigmoid for the vad
    family and relu when used as the cascade head inside the 'se' composite
    (reference: sj_train.py:254)."""
    v: int = 1
    n_classes: int = 3
    base_fsize: int = 32          # 48 for vad v8 (reference: sj_train.py:216-217)
    vad_variant: bool = True      # True when model_type == 'vad'
    final_act: str = 'sigmoid'
    td_dim: int = 1024
    dtype: object = jnp.float32   # compute dtype (bfloat16 for mixed prec)

    @nn.compact
    def __call__(self, x, training: bool = False):
        variant = self.vad_variant
        fsize = self.base_fsize
        dt = self.dtype
        x = x.astype(dt)
        x = ConvMPBlock(num_convs=2, fsize=fsize, use_bn=True,
                        dtype=dt)(x, training)
        for i in range(1, 5):
            if variant and self.v == 6:
                # 0.5 s smoothing pools; kernel from the current time width
                # (reference: sj_train.py:225-229)
                seconds = 0.5
                n_frame_in = x.shape[-2] * (2 ** i)   # undo pooling so far
                k = int(round(seconds / (256 * n_frame_in / 16000 / x.shape[-2])))
                k = max(k, 1)
                x = avg_pool_same(x, (1, k), (1, 1))
                x = nn.max_pool(x, (1, k * 2), (1, 1), padding='SAME')
            if variant and self.v == 7:
                # bias-free convs: each is followed by BN (see ConvMPBlock)
                skip = x
                c = skip.shape[-1]
                x = nn.Conv(c // 4, (1, 1), padding='SAME', use_bias=False,
                            dtype=dt)(x)
                x = BatchNorm(dt)(x, training)
                x = nn.relu(x)
                x = nn.Conv(c // 4, (3, 3), padding='SAME', use_bias=False,
                            dtype=dt)(x)
                x = BatchNorm(dt)(x, training)
                x = nn.relu(x)
                x = nn.Conv(c, (1, 1), padding='SAME', use_bias=False,
                            dtype=dt)(x)
                x = BatchNorm(dt)(x, training)
                x = nn.relu(x)
                x = x + skip
            x = ConvMPBlock(num_convs=3, fsize=fsize * 2 ** i,
                            use_bn=True, dtype=dt)(x, training)

        # [B, mel', T', C] -> time-major sequence [B, T', mel'*C]
        # (reference: sj_train.py:244-245)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x = nn.relu(nn.Dense(self.td_dim, dtype=dt)(x))  # TimeDistributed
        if variant and self.v == 9:
            x = FullyConnectedLayer(512, use_bn=True, dtype=dt)(x, training)
        x = FullyConnectedLayer(256, use_bn=True, dtype=dt)(x, training)
        x = FullyConnectedLayer(128, use_bn=True, dtype=dt)(x, training)
        if variant and self.v == 9:
            x = BiLSTM(128, dtype=dt)(x)
        x = FullyConnectedLayer(64, use_bn=True, dtype=dt)(x, training)
        act = nn.sigmoid if self.final_act == 'sigmoid' else nn.relu
        x = FullyConnectedLayer(self.n_classes, act=act, dtype=dt)(x, training)
        return x.astype(jnp.float32)   # head/loss always in f32
