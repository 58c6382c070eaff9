"""Main training entry (reference: sj_train.py:406-529).

CLI-compatible with the reference:
    python -m challenge_tpu.cli.sj_train --model_type vad --v 8 ...
(or the repo-root ``sj_train.py`` shim). The run-name grammar, checkpoint
trio ({name}.h5 / _SWA.h5 / _sample.h5), CSV log, monitors and callback
behavior match the reference; the execution engine is the fused TPU loop.
"""

from __future__ import annotations

import os

import numpy as np

from challenge_tpu.config import Config, config_from_args
from challenge_tpu.data.pipeline import DevicePipeline, build_banks
from challenge_tpu.models import get_model
from challenge_tpu.train import (
    CSVLogger, EarlyStopping, EvalCallback, LearningRateScheduler,
    ModelCheckpoint, NO_SWA_ERROR, SWA, TensorBoard, TerminateOnNaN,
    TrainLoop, TrainStateCheckpoint, custom_scheduler, load_weights,
    restore_train_state, save_weights)
from challenge_tpu.utils.io import load_data


def make_banks(config: Config, training: bool = True, n_classes: int = 3):
    """Load pickled spec sets and build device banks
    (reference: sj_train.py:74-90)."""
    datapath = config.datapath if os.path.exists(config.datapath) else ''
    if training:
        backgrounds = load_data(os.path.join(datapath, config.background_sounds))
        voices = load_data(os.path.join(datapath, config.voices))
        labels = load_data(os.path.join(datapath, config.labels))
    else:
        backgrounds = load_data(os.path.join(datapath, config.test_background_sounds))
        voices = load_data(os.path.join(datapath, config.test_voices))
        labels = load_data(os.path.join(datapath, config.test_labels))
    noises = load_data(os.path.join(datapath, config.noises))
    # on a TPU backend every config synthesizes through the Pallas kernel
    # (se_v9's seperate_noise_voice targets run as per-source-group kernel
    # calls — mixture.sample_batch), which never reads the dense f32 `data`
    # volume — drop it so the flat layout's dtype sets the bank HBM
    # footprint (data alone is ~2x the bf16 flat layout and ~7x int8)
    import jax
    slim = jax.default_backend() == 'tpu'
    if training and config.stream_chunks >= 2:
        # spec set larger than device HBM: rotate it through the device as
        # host-resident chunks (--stream_chunks N, --chunk_steps M)
        from challenge_tpu.data.streaming import build_streaming_banks
        return build_streaming_banks(
            backgrounds, voices, np.asarray(labels), noises,
            n_chunks=config.stream_chunks, n_classes=n_classes,
            one_hot=True, n_frame=config.n_frame,
            flat_dtype=config.bank_dtype, seed=config.seed,
            chunk_steps=config.chunk_steps, data_resident=not slim)
    # bank_shard: build host-side so shard_banks can place each device's
    # block directly — device-built banks would materialize the whole set
    # on device 0 first, defeating the capacity scaling the flag promises
    return build_banks(backgrounds, voices, np.asarray(labels), noises,
                       n_classes=n_classes, one_hot=True,
                       n_frame=config.n_frame,
                       flat_dtype=config.bank_dtype,
                       host=bool(getattr(config, 'bank_shard', False)),
                       data_resident=not slim)


def make_dataset(config: Config, training: bool = True, n_classes: int = 3):
    """API parity with the reference's make_dataset (sj_train.py:74-130):
    returns an infinite iterator of ready device batches."""
    banks = make_banks(config, training, n_classes)
    return DevicePipeline(banks, config, training=training, variant='sj',
                          n_classes=n_classes)


def select_monitors(config: Config):
    """Reference monitor selection (sj_train.py:475-486)."""
    if config.model_type == 'se' and config.v == 9:
        if config.pretrain:
            return 'val_speech_loss', 'val_speech_loss'
        return 'val_class_loss', 'val_class_er'
    return 'val_loss', 'val_er'


def main(argv=None):
    config = config_from_args(argv)
    config.loss = config.loss.upper()
    if config.loss != 'MSE':
        config.mse_multiplier = 1
    print(config)

    name = config.run_name()
    name = name if name.endswith('.h5') else name + '.h5'

    bundle = get_model(config)
    # fused mode: each dispatch is one XLA program doing synthesis ->
    # features -> fwd/bwd -> optimizer over the HBM-resident banks.
    # On a multi-chip host a DP mesh shards the batch (grad psums over ICI);
    # --bank_shard additionally splits the banks' clip axis across chips.
    from challenge_tpu.parallel import mesh_for_config
    mesh = mesh_for_config(config)
    if mesh is not None:
        print(f'data-parallel mesh over {int(mesh.devices.size)} devices'
              + (' (banks sharded)' if config.bank_shard else ''))
    train_banks = make_banks(config, training=True)
    val_banks = make_banks(config, training=False)
    loop = TrainLoop(bundle, seed=config.seed, banks=train_banks,
                     val_banks=val_banks, mesh=mesh)
    print(bundle.summary(loop.state.weights()))   # reference: sj_train.py:464
    print(name)

    if config.model_type == 'se' and config.v == 9 and not config.pretrain:
        loop.set_weights(load_weights(name, loop.state.weights(),
                                      bundle=bundle))
        print('loaded pretrained model')

    # preemption-safe resume (additive; the reference persists weights
    # only — SURVEY §5.4): --ckpt_dir enables periodic Orbax full-state
    # checkpoints, --resume restores the latest one and continues the
    # epoch schedule where it left off
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

    earlystop_monitor, checkpoint_monitor = select_monitors(config)

    callbacks = [
        CSVLogger(name.replace('.h5', '.csv'), append=True),
        SWA(start_epoch=config.epochs // 4, swa_freq=2),
        ModelCheckpoint(name, monitor=checkpoint_monitor,
                        save_best_only=True, verbose=1,
                        keras=config.keras_ckpt),
        TerminateOnNaN(),
        TensorBoard(log_dir=os.path.join('tensorboard_log',
                                         name.split('.h5')[0])),
        EarlyStopping(monitor=earlystop_monitor, patience=config.patience,
                      restore_best_weights=True),
        EvalCallback(config, name, keras=config.keras_ckpt),
        LearningRateScheduler(
            custom_scheduler(4096, config.epochs / 12, config.lr_div)),
    ]
    if config.ckpt_dir:
        callbacks.append(TrainStateCheckpoint(
            config.ckpt_dir, every_epochs=config.ckpt_every_epochs))

    try:
        loop.fit(epochs=config.epochs,
                 steps_per_epoch=config.steps_per_epoch,
                 validation_steps=16,
                 callbacks=callbacks,
                 initial_epoch=initial_epoch)
        print('best model:', name.replace('.h5', '_SWA.h5'))
        save_weights(name.replace('.h5', '_SWA.h5'), loop.state.weights(),
                     bundle=bundle, keras=config.keras_ckpt)
    except NO_SWA_ERROR:
        pass
    print(name.split('.h5')[0])


if __name__ == '__main__':
    main()
