"""Density-label training entry (reference: trainer.py:213-289).

EfficientNet regression on density labels with the count + total-variation
loss, AdaBelief default, SWA from epochs/2, and the pretrain branch swapping
the warmup scheduler for ReduceLROnPlateau.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from challenge_tpu.config import Config
from challenge_tpu.data.pipeline import DevicePipeline, build_banks
from challenge_tpu.models import get_density_model
from challenge_tpu.train import (
    CSVLogger, LearningRateScheduler, ModelCheckpoint, ReduceLROnPlateau,
    SWA, TerminateOnNaN, TrainLoop, TrainStateCheckpoint, custom_scheduler,
    load_weights, restore_train_state, save_weights)
from challenge_tpu.train.losses import density_loss
from challenge_tpu.utils.io import load_data


def build_args():
    """The reference trainer's flat flag surface (trainer.py:17-60)."""
    args = argparse.ArgumentParser()
    args.add_argument('--name', type=str, required=True)
    args.add_argument('--model', type=str, default='EfficientNetB4')
    args.add_argument('--pretrain', type=bool, default=False)
    args.add_argument('--n_layers', type=int, default=0)
    args.add_argument('--n_dim', type=int, default=256)
    args.add_argument('--n_chan', type=int, default=1)
    args.add_argument('--n_classes', type=int, default=3)
    args.add_argument('--datapath', type=str,
                      default='/root/datasets/Interspeech2020/generate_wavs/codes')
    args.add_argument('--background_sounds', type=str,
                      default='drone_normed_complex_v3.pickle')
    args.add_argument('--voices', type=str,
                      default='voice_normed_complex_v3.pickle')
    args.add_argument('--labels', type=str, default='voice_labels_mfc_v3.npy')
    args.add_argument('--noises', type=str, default='noises_specs_v2.pickle')
    args.add_argument('--test_background_sounds', type=str,
                      default='dummy_specs.pickle')
    args.add_argument('--test_voices', type=str, default='dummy_specs.pickle')
    args.add_argument('--test_labels', type=str, default='dummy_labels.npy')
    args.add_argument('--n_mels', type=int, default=80)
    args.add_argument('--optimizer', type=str, default='adabelief',
                      choices=['adam', 'sgd', 'rmsprop', 'adabelief'])
    args.add_argument('--lr', type=float, default=1e-4)
    args.add_argument('--end_lr', type=float, default=1e-4)
    args.add_argument('--lr_power', type=float, default=0.5)
    args.add_argument('--lr_div', type=float, default=2)
    args.add_argument('--clipvalue', type=float, default=0.01)
    args.add_argument('--epochs', type=int, default=500)
    args.add_argument('--batch_size', type=int, default=12)
    args.add_argument('--n_frame', type=int, default=2048)
    args.add_argument('--steps_per_epoch', type=int, default=100)
    args.add_argument('--l1', type=float, default=0)
    args.add_argument('--l2', type=float, default=1e-6)
    args.add_argument('--loss_alpha', type=float, default=0.8)
    args.add_argument('--loss_l2', type=float, default=1.)
    args.add_argument('--multiplier', type=float, default=10)
    args.add_argument('--snr', type=float, default=-15)
    args.add_argument('--max_voices', type=int, default=10)
    args.add_argument('--max_noises', type=int, default=6)
    # TPU-native additive flags (absent in the reference)
    from challenge_tpu.config import str2bool
    args.add_argument('--ckpt_dir', type=str, default='')
    args.add_argument('--resume', type=str2bool, default=False)
    args.add_argument('--ckpt_every_epochs', type=int, default=10)
    args.add_argument('--bank_dtype', type=str, default='float32',
                      choices=['float32', 'bfloat16', 'int8'])
    args.add_argument('--remat', type=str2bool, default=False)
    args.add_argument('--n_devices', type=int, default=0)
    args.add_argument('--bank_shard', type=str2bool, default=False)
    args.add_argument('--stream_chunks', type=int, default=0)
    args.add_argument('--chunk_steps', type=int, default=4)
    args.add_argument('--keras_ckpt', type=str2bool, default=False,
                      help='write checkpoints as reference-loadable Keras '
                           'legacy .h5 instead of flax msgpack')
    args.add_argument('--seed', type=int, default=0)
    args.add_argument('--compute_dtype', type=str, default='float32',
                      choices=['float32', 'bfloat16'])
    args.add_argument('--steps_per_call', type=int, default=1)
    args.add_argument('--grad_accum', type=int, default=1,
                      help='microbatches averaged per optimizer step '
                           '(effective batch = grad_accum * batch_size at '
                           'one microbatch\'s activation memory)')
    return args


def to_config(ns) -> Config:
    cfg = Config(model_type='eff', v=0)
    for f in ('name', 'pretrain', 'n_layers', 'n_dim', 'n_chan', 'n_classes',
              'datapath', 'background_sounds', 'voices', 'labels', 'noises',
              'test_background_sounds', 'test_voices', 'test_labels',
              'n_mels', 'optimizer', 'lr', 'clipvalue', 'epochs',
              'batch_size', 'n_frame', 'steps_per_epoch', 'snr',
              'max_voices', 'max_noises', 'lr_div',
              'ckpt_dir', 'resume', 'ckpt_every_epochs',
              'bank_dtype', 'remat', 'n_devices', 'bank_shard',
              'stream_chunks', 'chunk_steps', 'keras_ckpt',
              'seed', 'compute_dtype', 'steps_per_call', 'grad_accum'):
        setattr(cfg, f, getattr(ns, f))
    cfg.model = ns.model
    cfg.mse_multiplier = ns.multiplier
    return cfg


def make_banks(config: Config, training: bool = True, n_classes: int = 3):
    """reference: trainer.py:107-123 — load spec sets, build device banks."""
    datapath = config.datapath if os.path.exists(config.datapath) else ''
    files = (config.background_sounds, config.voices, config.labels) \
        if training else (config.test_background_sounds, config.test_voices,
                          config.test_labels)
    backgrounds = load_data(os.path.join(datapath, files[0]))
    voices = load_data(os.path.join(datapath, files[1]))
    labels = load_data(os.path.join(datapath, files[2]))
    noises = load_data(os.path.join(datapath, config.noises))
    # the density family always synthesizes through the Pallas kernel on a
    # TPU backend, so the dense f32 `data` volume is dead weight there —
    # see cli/sj_train.make_banks
    import jax
    slim = jax.default_backend() == 'tpu'
    if training and config.stream_chunks >= 2:
        from challenge_tpu.data.streaming import build_streaming_banks
        return build_streaming_banks(
            backgrounds, voices, np.asarray(labels), noises,
            n_chunks=config.stream_chunks, n_classes=n_classes,
            one_hot=True, n_frame=config.n_frame,
            flat_dtype=config.bank_dtype, seed=config.seed,
            chunk_steps=config.chunk_steps, data_resident=not slim)
    # bank_shard: build host-side so shard_banks can place each device's
    # block directly (see cli/sj_train.make_banks)
    return build_banks(backgrounds, voices, np.asarray(labels), noises,
                       n_classes=n_classes, one_hot=True,
                       n_frame=config.n_frame,
                       flat_dtype=config.bank_dtype,
                       host=bool(getattr(config, 'bank_shard', False)),
                       data_resident=not slim)


def make_dataset(config: Config, training: bool = True, n_classes: int = 3):
    """reference: trainer.py:107-141 — density-label pipeline."""
    banks = make_banks(config, training=training, n_classes=n_classes)
    return DevicePipeline(banks, config, training=training,
                          variant='density', n_classes=n_classes)


def main(argv=None):
    ns = build_args().parse_args(argv)
    config = to_config(ns)
    print(config)
    name = ns.name if ns.name.endswith('.h5') else ns.name + '.h5'

    bundle = get_density_model(config)
    # count + TV loss replaces the classification loss
    # (reference: trainer.py:251-253)
    base = density_loss(alpha=ns.loss_alpha, l2=ns.loss_l2)
    loss_fn = lambda t, p: (base(t, p), {})  # noqa: E731
    # the reference gates on l2 ONLY (trainer.py:248-250: `if config.l2 >
    # 0`), so an l1-only run trains unregularized — quirk preserved
    if ns.l2 > 0:
        from challenge_tpu.train.regularizers import (
            apply_kernel_regularizer, l1_l2)
        loss_fn = apply_kernel_regularizer(loss_fn, l1_l2(ns.l1, ns.l2))

    # multi-chip: fused banks mode over a DP mesh (synthesis + features +
    # fwd/bwd + optimizer in one sharded XLA program per dispatch);
    # --stream_chunks also forces fused mode (chunk rotation rides the
    # fused step); otherwise single-device keeps the reference-shaped
    # iterator pipeline
    from challenge_tpu.parallel import mesh_for_config
    mesh = mesh_for_config(config)
    # grad_accum rides the fused step (TrainLoop's iterator mode refuses it
    # loudly), so accumulation also forces fused banks mode here
    fused = (mesh is not None or config.stream_chunks >= 2
             or config.grad_accum > 1)
    if mesh is not None:
        print(f'data-parallel mesh over {int(mesh.devices.size)} devices'
              + (' (banks sharded)' if config.bank_shard else ''))
    if fused:
        loop = TrainLoop(
            bundle, seed=config.seed, loss_fn=loss_fn, mesh=mesh,
            variant='density',
            banks=make_banks(config, training=True, n_classes=ns.n_classes),
            val_banks=make_banks(config, training=False,
                                 n_classes=ns.n_classes))
    else:
        loop = TrainLoop(bundle, seed=config.seed, loss_fn=loss_fn)

    # NOTE: no summary print here — the reference keeps model.summary()
    # commented out in this entry (trainer.py:254)

    if ns.pretrain:
        loop.set_weights(load_weights(name, loop.state.weights(),
                                      bundle=bundle))
        print('loaded pretrained model')

    # preemption-safe resume (additive; see cli/sj_train.py)
    initial_epoch = 0
    if config.ckpt_dir and config.resume:
        try:
            loop.state = restore_train_state(config.ckpt_dir, loop.state)
            initial_epoch = int(loop.state.step) // \
                loop.steps_per_fused_epoch(config.steps_per_epoch)
            print(f'resumed from step {int(loop.state.step)} '
                  f'(epoch {initial_epoch})')
        except FileNotFoundError:
            print(f'no checkpoint under {config.ckpt_dir!r}; '
                  'starting fresh')

    if fused:
        train_set = test_set = None   # fused mode draws from the banks
    else:
        train_set = make_dataset(config, training=True,
                                 n_classes=ns.n_classes)
        test_set = make_dataset(config, training=False,
                                n_classes=ns.n_classes)

    callbacks = [
        CSVLogger(name.replace('.h5', '.log'), append=True),
        SWA(start_epoch=config.epochs // 2, swa_freq=2),
        ModelCheckpoint(name, monitor='val_loss', save_best_only=True,
                        verbose=1, keras=config.keras_ckpt),
        TerminateOnNaN(),
    ]
    if not ns.pretrain:
        callbacks.append(LearningRateScheduler(
            custom_scheduler(4096, config.epochs / 12, ns.lr_div)))
    else:
        callbacks.append(ReduceLROnPlateau(monitor='loss', factor=0.9,
                                           patience=5))
    if config.ckpt_dir:
        callbacks.append(TrainStateCheckpoint(
            config.ckpt_dir, every_epochs=config.ckpt_every_epochs))

    loop.fit(train_set, epochs=config.epochs,
             steps_per_epoch=config.steps_per_epoch,
             validation_iter=test_set, validation_steps=16,
             callbacks=callbacks, initial_epoch=initial_epoch)
    save_weights(name.replace('.h5', '_SWA.h5'), loop.state.weights(),
                 bundle=bundle, keras=config.keras_ckpt)


if __name__ == '__main__':
    main()
