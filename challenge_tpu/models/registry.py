"""``get_model(config)`` — the single model entry point
(reference: sj_train.py:295-403).

Returns a :class:`ModelBundle`, the functional analogue of a compiled Keras
model: the linen module, its example input shape, pure ``init``/``apply``
closures, and the trainable-parameter mask implementing the 'se' cascade's
pretrain/finetune freeze flow (reference: sj_train.py:306,316-318).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from challenge_tpu.config import Config
from challenge_tpu.models.effnet import EffNetSED
from challenge_tpu.models.senet import SECascade
from challenge_tpu.models.vad import VADModel


@dataclass
class ModelBundle:
    module: nn.Module
    input_shape: Tuple[int, ...]      # per-example (no batch dim)
    config: Config
    multi_output: bool = False        # True for the 'se' triple head
    needs_dropout_rng: bool = False   # effnet stochastic depth

    def init(self, key, batch_size: int = 1):
        x = jnp.zeros((batch_size,) + self.input_shape, jnp.float32)
        keys = {'params': key}
        if self.needs_dropout_rng:
            keys['dropout'] = jax.random.fold_in(key, 1)
        return self.module.init(keys, x, training=False)

    def apply(self, variables, x, training: bool = False,
              rngs: Optional[dict] = None):
        """Forward pass. In training mode returns (outputs, new_batch_stats)."""
        if training:
            if self.needs_dropout_rng and (rngs is None or 'dropout' not in rngs):
                raise ValueError('training forward needs a dropout rng')
            out, mut = self.module.apply(
                variables, x, training=True, rngs=rngs,
                mutable=['batch_stats'])
            return out, mut['batch_stats']
        return self.module.apply(variables, x, training=False)

    def summary(self, variables=None) -> str:
        """``model.summary()`` analogue (the reference prints one at
        startup, sj_train.py:464): per-top-level-module parameter counts
        and the total, from already-initialized variables (or a fresh
        init when none are given)."""
        if variables is None:
            variables = self.init(jax.random.PRNGKey(0))
        params = variables.get('params', variables)
        name = type(self.module).__name__
        lines = [f'Model: {name}  (input {self.input_shape})']
        total = 0
        for key in sorted(params.keys()):
            n = sum(int(x.size) for x in jax.tree.leaves(params[key]))
            total += n
            lines.append(f'  {key:<40} {n:>14,}')
        lines.append(f'  {"Total params":<40} {total:>14,}')
        return '\n'.join(lines)

    def trainable_mask(self, params):
        """Pytree of bools marking trainable leaves (reference freeze flow:
        sj_train.py:306,316-318 — pretrain trains the U-Net, finetune trains
        the VAD head)."""
        if self.config.model_type != 'se':
            return jax.tree.map(lambda _: True, params)

        def mark(tree, value):
            return jax.tree.map(lambda _: value, tree)

        pretrain = bool(self.config.pretrain)
        out = {}
        for k, sub in params.items():
            in_se = (k == 'se')
            out[k] = mark(sub, in_se if pretrain else not in_se)
        return type(params)(out) if isinstance(params, FrozenDict) else out


def _dtype(config: Config):
    name = getattr(config, 'compute_dtype', 'float32')
    return jnp.bfloat16 if str(name) in ('bfloat16', 'bf16') else jnp.float32


def get_model(config: Config) -> ModelBundle:
    """Build the model family selected by ``config.model_type``
    (reference: sj_train.py:295-403)."""
    if config.model_type == 'vad':
        module = VADModel(
            v=config.v, n_classes=config.n_classes,
            base_fsize=48 if config.v == 8 else 32,
            vad_variant=True, final_act='sigmoid', dtype=_dtype(config))
        shape = (config.n_mels, config.n_frame, config.n_chan)
        return ModelBundle(module, shape, config)

    if config.model_type == 'eff':
        if config.v in (2, 4):
            raise ValueError(f'version {config.v} is deprecated')
        if config.v not in (1, 3, 5, 6, 7):
            raise ValueError('wrong version')
        module = EffNetSED(
            model=config.model, v=config.v, n_classes=config.n_classes,
            n_layers=config.n_layers, n_dim=config.n_dim,
            n_frame=config.n_frame, n_mels=config.n_mels, head='sed',
            dtype=_dtype(config))
        shape = (config.n_mels, config.n_frame, config.n_chan)
        return ModelBundle(module, shape, config, needs_dropout_rng=True)

    if config.model_type == 'se':
        module = SECascade(v=config.v, n_classes=config.n_classes,
                           dtype=_dtype(config),
                           pretrain=bool(config.pretrain))
        # input is the speech_enhancement_preprocess layout
        # (reference: sj_train.py:300 — 256 freq rows)
        shape = (256, config.n_frame, config.n_chan)
        return ModelBundle(module, shape, config, multi_output=True)

    raise ValueError(f'unknown model_type: {config.model_type!r}')


def parse_model_id(model) -> int:
    """The reference names EfficientNet backbones by string
    ('EfficientNetB4', trainer.py:18) or scale int (sj_train.py's --model);
    this is THE rule turning either into the B-number — shared with the
    .h5 interop plans so they can't drift."""
    return model if isinstance(model, int) else int(str(model)[-1])


def get_density_model(config: Config) -> ModelBundle:
    """The trainer.py EfficientNet regression variant
    (reference: trainer.py:222-236)."""
    model_id = parse_model_id(config.model)
    module = EffNetSED(
        model=model_id, v=0, n_classes=config.n_classes,
        n_layers=config.n_layers, n_dim=config.n_dim,
        n_frame=config.n_frame, n_mels=config.n_mels, head='density',
        dtype=_dtype(config))
    shape = (config.n_mels, config.n_frame, config.n_chan)
    return ModelBundle(module, shape, config, needs_dropout_rng=True)
