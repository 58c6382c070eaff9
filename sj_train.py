#!/usr/bin/env python
"""Entry-point shim: ``python sj_train.py --model_type vad --v 8 ...``
(reference signature preserved; implementation in challenge_tpu.cli.sj_train).

Every top-level symbol of the reference module (sj_train.py:20-406) resolves
here, backed by the TPU-native implementations — model builders return flax
modules, not Keras models.
"""
from challenge_tpu.cli.sj_train import main, make_banks, make_dataset  # noqa: F401
from challenge_tpu.config import ARGS, Config, build_argparser  # noqa: F401
from challenge_tpu.models import get_model  # noqa: F401
# reference: sj_train.py:191-211 — the conv/FC building blocks keep their
# names (flax modules here)
from challenge_tpu.models.layers import ConvMPBlock, FullyConnectedLayer  # noqa: F401
# reference: sj_train.py:158-188 — CustomModel is a Keras Model whose
# train_step adds AGC; the TPU-native split puts the model in a ModelBundle
# and the AGC step in train.state.make_train_step (wired automatically by
# TrainLoop), so the bundle is the object standing in CustomModel's place
from challenge_tpu.models.registry import ModelBundle as CustomModel  # noqa: F401
from challenge_tpu.models.senet import ConvSet as convset  # noqa: F401
from challenge_tpu.models.senet import Upsampling as upsampling  # noqa: F401
from challenge_tpu.train.optim import adaptive_clip_grad, custom_scheduler  # noqa: F401


def define_keras_model(config=None):
    """The VAD CRNN builder (reference: sj_train.py:214-255), returning the
    TPU-native flax module."""
    from challenge_tpu.models.registry import _dtype
    from challenge_tpu.models.vad import VADModel
    return VADModel(v=config.v, n_classes=config.n_classes,
                    base_fsize=48 if (config.model_type == 'vad'
                                      and config.v == 8) else 32,
                    vad_variant=config.model_type == 'vad',
                    final_act='sigmoid', dtype=_dtype(config))


def speech_enhancement_model(input=None, dtype=None):
    """The SE U-Net builder (reference: sj_train.py:276-292). The reference
    signature takes the input *tensor* (Keras functional style); the flax
    module is shape-polymorphic, so the argument is accepted and unused."""
    import jax.numpy as jnp
    from challenge_tpu.models.senet import SpeechEnhancementModel
    return SpeechEnhancementModel(dtype=dtype or jnp.float32)


if __name__ == '__main__':
    main()
