"""Speech-enhancement U-Net family (reference: sj_train.py:258-339).

``SpeechEnhancementModel``: a 4-level encoder with two skip-connected
Conv2DTranspose decoders producing (speech, noise) estimates of the real-half
STFT. ``SECascade`` composes it with a VAD CRNN head run on the enhanced
speech branch, with the two-phase pretrain/finetune freeze flow
(reference: sj_train.py:299-339): pretrain trains the U-Net (VAD frozen),
finetune trains the VAD (U-Net frozen). Freezing is implemented functionally
in the train step via a trainable-parameter mask (see
``challenge_tpu.models.registry.trainable_mask``) rather than Keras'
``trainable=False`` mutation.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from challenge_tpu.models.layers import BatchNorm, max_pool_same
from challenge_tpu.models.vad import VADModel


class ConvSet(nn.Module):
    """2 x (Conv3x3 + BN + ReLU) -> MaxPool2x2 (reference: sj_train.py:258-265)."""
    chan: int = 16
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        for _ in range(2):
            # bias-free: followed by BN (see layers.ConvMPBlock)
            x = nn.Conv(self.chan, (3, 3), padding='SAME', use_bias=False,
                        dtype=self.dtype)(x)
            x = BatchNorm(self.dtype)(x, training)
            x = nn.relu(x)
        return max_pool_same(x, (2, 2), (2, 2))


class Upsampling(nn.Module):
    """Conv3x3 + BN + ReLU -> Conv2DTranspose(2x2, stride 2)
    (reference: sj_train.py:268-273)."""
    chan: int = 64
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.chan, (3, 3), padding='SAME', use_bias=False,
                    dtype=self.dtype)(x)
        x = BatchNorm(self.dtype)(x, training)
        x = nn.relu(x)
        return nn.ConvTranspose(self.chan, (2, 2), strides=(2, 2),
                                padding='SAME', dtype=self.dtype)(x)


class SpeechEnhancementModel(nn.Module):
    """U-Net over [B, n_frame, 256, C] -> (speech, noise), each
    [B, n_frame, 256, 2] (reference: sj_train.py:276-292)."""
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        inp1 = ConvSet(64, dt)(x, training)
        inp2 = ConvSet(128, dt)(inp1, training)
        inp3 = ConvSet(256, dt)(inp2, training)
        latent = ConvSet(512, dt)(inp3, training)

        def decoder():
            out3 = Upsampling(256, dt)(latent, training)
            out2 = Upsampling(128, dt)(
                jnp.concatenate([inp3, out3], -1), training)
            out1 = Upsampling(64, dt)(
                jnp.concatenate([inp2, out2], -1), training)
            return Upsampling(2, dt)(
                jnp.concatenate([inp1, out1], -1), training)

        speech = decoder()
        noise = decoder()
        return speech, noise


class SECascade(nn.Module):
    """'se' composite model (reference: sj_train.py:299-339).

    Input [B, 256, n_frame, n_chan] (the speech_enhancement_preprocess
    layout: DC row dropped, real half only). Output
    [class [B, T', n_classes], speech [B, 256, n_frame, 2],
    noise [B, 256, n_frame, 2]].
    """
    v: int = 9
    n_classes: int = 3
    dtype: object = jnp.float32
    pretrain: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        # Keras `submodel.trainable = False` (sj_train.py:306,316-318)
        # does more than mask gradients: it forces the submodel's
        # BatchNorm layers into INFERENCE mode (TF2 semantics) — frozen
        # moving statistics, normalization by them, no stat updates.
        # Mirror that by dropping the training flag on the frozen half
        # (pretrain trains 'se' and freezes 'vad'; finetune the reverse).
        se_training = training and self.pretrain
        vad_training = training and not self.pretrain
        # transpose to U-Net layout (reference: sj_train.py:302)
        merge_input = x.transpose(0, 2, 1, 3)
        speech, noise = SpeechEnhancementModel(dtype=self.dtype, name='se')(
            merge_input, se_training)
        speech = speech.astype(jnp.float32)
        noise = noise.astype(jnp.float32)
        out = speech.transpose(0, 2, 1, 3)     # [B, 256, n_frame, 2]
        # cascade head: a VAD CRNN on the enhanced speech
        # (reference: sj_train.py:312-318 — n_mels := 256, n_chan := 2).
        # The inner head's final activation is relu, not sigmoid: the
        # reference's define_keras_model keys the act off model_type=='vad'
        # which is False here (sj_train.py:254).
        cls = VADModel(v=self.v, n_classes=self.n_classes,
                       vad_variant=False, final_act='relu',
                       dtype=self.dtype, name='vad')(out, vad_training)
        return cls, speech.transpose(0, 2, 1, 3), noise.transpose(0, 2, 1, 3)
