"""Batch pipeline: banks + one jitted feature chain replace tf.data.

The reference assembles a tf.data graph of generator streams and ~10 map
stages all running on host CPU (reference: pipeline.py:113-175,
sj_train.py:74-130, trainer.py:107-141). Here the equivalent chain is a single
jitted function from (PRNG key, HBM-resident banks) to a ready (features,
labels) batch, so it can either be iterated stand-alone (`DevicePipeline`) or
inlined into the training step for a fully fused synth->features->grads XLA
program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from challenge_tpu.config import Config
from challenge_tpu.data import labels as label_maps
from challenge_tpu.data.mixture import (
    Banks, pallas_synth_eligible, sample_batch)
from challenge_tpu.data.specset import (
    build_bank, flat_freq_pad, normalize_flat_dtype, remap_labels)
from challenge_tpu.ops.augment import (
    batch_mask, batch_mask_keep, batch_random_merge_aug, batch_specaugment,
    stft_filter)
from challenge_tpu.ops.mel import mel_filterbank
from challenge_tpu.ops.norms import EPSILON, minmax, safe_div

# model versions trained against 32x-downsampled labels (reference: utils.py:7)
LABEL_DOWNSAMPLE_MODELS = (3, 6, 7, 8, 9)


def build_banks(backgrounds, voices, labels, noises=None,
                n_classes: int = 3, one_hot: bool = True,
                n_frame: Optional[int] = None,
                flat_dtype=np.float32, host: bool = False,
                data_resident: bool = True) -> Banks:
    """Host lists -> device banks. ``labels`` may be int class ids (remapped
    and one-hotted, reference: sj_train.py:86-88) or already one-hot.

    Pass ``n_frame`` (the training window length) so the background bank's
    flat layout is cyclically tiled when any background is shorter than the
    window — the Pallas synthesis fast path then reproduces the reference's
    tile-then-crop semantics (pipeline.py:29-35) instead of falling back to
    the XLA modular gather.

    flat_dtype=jnp.bfloat16 halves the synthesis kernel's HBM traffic (the
    pipeline's bound); int8 halves it again with per-item max-abs
    quantization (dequant scales fold into the mix weights); mixing still
    accumulates in float32 either way — see specset.build_bank. Opt-in:
    float32 (default) is bit-exact vs the XLA path and the reference.
    Accepts the Config.bank_dtype strings too.

    host=True keeps every leaf in host RAM (numpy) instead of committing
    it to the default device — required for ``parallel.mesh.shard_banks``
    to scale dataset capacity with the mesh: device-built banks would
    materialize the FULL dataset on device 0 before any sharding, so a
    set sized for N chips OOMs chip 0 first. device_put of host shards
    places each device's block directly.

    data_resident=False drops the dense f32 ``data`` volume (the Pallas
    synthesis path reads only the flat layout + lens/pos_mask); without it
    the reduced-precision flat dtypes deliver their full capacity factor —
    see specset.build_bank. Requires a Pallas-eligible consumer (pass
    ``n_frame`` so the background wrap keeps the fast path exact); the XLA
    fallback raises loudly on slim banks.
    """
    flat_dtype = normalize_flat_dtype(flat_dtype)
    labels = np.asarray(labels)
    if one_hot and labels.ndim == 1:
        labels = remap_labels(labels, n_classes)
    return Banks(
        backgrounds=build_bank(backgrounds, wrap_frames=n_frame,
                               flat_dtype=flat_dtype, host=host,
                               data_resident=data_resident),
        voices=build_bank(voices, flat_dtype=flat_dtype, host=host,
                          data_resident=data_resident),
        voice_labels=(np.asarray(labels, np.float32) if host
                      else jnp.asarray(labels, jnp.float32)),
        noises=(build_bank(noises, flat_dtype=flat_dtype, host=host,
                           data_resident=data_resident)
                if noises is not None else None),
    )


def complex_to_mel(spec, mel_matrix, layout: str = 'ftc'):
    """Fused |STFT| -> mel: the reference's complex_to_magphase +
    magphase_to_mel (transforms.py:111-123, 51-77) without the unused atan2.

    spec: [B, freq, T, chan*2] ('ftc', reference layout) or
    [B, T, freq, chan*2] ('tfc', synthesis-native) -> [B, n_mels, T, chan]
    — identical output values either way.
    """
    n_chan = spec.shape[-1] // 2
    real, imag = spec[..., :n_chan], spec[..., n_chan:]
    mag = jnp.sqrt(real * real + imag * imag)
    eq = 'btfc,fm->bmtc' if layout == 'tfc' else 'bftc,fm->bmtc'
    return jnp.einsum(eq, mag, mel_matrix,
                      precision=jax.lax.Precision.HIGHEST)


def make_feature_fn(config: Config, training: bool = True,
                    variant: str = 'sj', n_classes: Optional[int] = None,
                    jit: bool = True, use_pallas=None, fused_mag=None,
                    fused_mel=None):
    """Build the (key, banks) -> (x, y) batch function (jitted by default;
    pass jit=False to get the raw body for fusing into a larger XLA program,
    e.g. the fully-fused synthesis+features+train step).

    n_classes: None = infer from ``banks.voice_labels`` at trace time (the
    one-hot width is a static shape), so the fused train step works for the
    30-class density banks without threading the count through every layer.

    variant='sj' reproduces sj_train.make_dataset's map chain
    (sj_train.py:91-130); variant='density' reproduces trainer.make_dataset
    (trainer.py:124-141).

    use_pallas: None = auto (the Pallas placement kernel on a TPU backend,
    XLA scatter elsewhere). Pass False inside SPMD-partitioned programs —
    the partitioner cannot split a pallas_call.

    fused_mag: None = auto (fused flat-magnitude chain whenever eligible).
    Pass False to force the explicit complex -> |.| -> mel chain — same
    values, used by differential tests to pin the fused rewrite against the
    reference-shaped path.

    fused_mel: None = auto (on eligible fused_mag + Pallas configs the
    whole |.| -> masks -> mel -> minmax chain runs INSIDE the synthesis
    kernel — the complex volume never touches HBM). Pass False to force
    the XLA chain after the kernel. The fused-mel mel GEMM runs on the MXU
    with HIGHEST precision but its f32 reduction order differs from XLA's
    conv emitter, so features match the XLA chain to ~1e-6 relative rather
    than bitwise; synthesis itself stays bit-exact (pin with fused_mel=False).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    mel_m = mel_filterbank(config.n_mels)
    se_v9 = config.model_type == 'se' and config.v == 9
    use_filter = 'filter' in config.name
    use_minmax = 'nominmax' not in config.name
    filter_num = int(round(200 / (16000 / 256)))  # reference: sj_train.py:117
    loss_is_mse = config.loss.upper() in ('MSE', 'MAE')

    # n_chan == 2 keeps both channels untouched (mono/stereo/random-merge
    # maps are the only complex-domain ops), so |.| commutes with the whole
    # pre-mel chain (SpecAugment masks and stft_filter are {0,1} products)
    # and synthesis can emit magnitudes directly — the complex spectrogram
    # volume is never materialized outside the synthesis kernel
    if fused_mag is None:
        fused_mag = config.n_chan == 2 and not se_v9
    elif fused_mag:
        assert config.n_chan == 2 and not se_v9, \
            'fused_mag requires the n_chan==2 non-se configuration'

    freq = int(mel_m.shape[0])
    # flat-magnitude constants, built ONCE at closure-build time as numpy
    # (creating device constants inside `fn` would leak traced constants
    # across jit traces); the eligible config (n_chan == 2) always has
    # 2 complex channels -> bank chan 4 -> 2 magnitude planes
    half = 2
    f_r = flat_freq_pad(freq, 2 * half)
    if fused_mag:
        # block-diagonal mel matrix for the flat layout:
        # row c*f_r + f -> (mel m, chan c); zero pad rows
        mel_big = np.zeros((half * f_r, mel_m.shape[1], half), np.float32)
        for c in range(half):
            mel_big[c * f_r: c * f_r + freq, :, c] = np.asarray(mel_m)
        idx = np.arange(freq)
        keep = ((idx < 1) | (idx >= filter_num + 1)).astype(np.float32)
        flat_filter_cols = np.tile(
            np.pad(keep, (0, f_r - freq), constant_values=1.0), half)
        # in-kernel mel GEMM operand: [half*f_r, n_mels*half], col m*half+c
        mel_flat2d = mel_big.reshape(half * f_r, -1)
    if fused_mel is None:
        # measured SLOWER than the in-kernel-magnitude + XLA-mel default on
        # v5e even after cross-step software pipelining (55.5k vs 67.7k
        # clips/s at B=512 f32; unpipelined it was 46.4k): the per-sample
        # [T, F/2] x [F/2, n_out] f32 GEMM can only hide under the
        # background DMA, and finer interleaving with the clip DMAs
        # measured worse (see ops/pallas_synth.py). The XLA batch-level
        # mel pass amortizes the MXU properly. Kept as an opt-in.
        fused_mel = False
    elif fused_mel:
        assert fused_mag and use_pallas and variant in ('sj', 'density'), \
            'fused_mel requires the eligible fused_mag + Pallas configuration'

    def _flat_specaugment(k_aug, magflat):
        """SpecAugment on the flat magnitude: identical mask distributions
        (time over n_frame, freq over the true 257 rows — NOT the padded
        f_r), applied as column products. Same key split order as
        batch_specaugment, so the RNG stream matches the complex path."""
        k_t, k_f = jax.random.split(k_aug)
        magflat = batch_mask(k_t, magflat, axis=1,
                             max_mask_size=24, n_mask=6)
        m = batch_mask_keep(k_f, magflat.shape[0], freq,
                            max_mask_size=16, n_mask=1)
        m = jnp.pad(m, ((0, 0), (0, f_r - freq)), constant_values=1.0)
        return magflat * jnp.tile(m, (1, half))[:, None, :]

    def _fused_mel_fn(k_mix, k_aug, banks: Banks):
        """|.| + masks + mel + minmax fused into the synthesis kernel; only
        the log/normalize epilogue and label maps run as XLA ops. Masks are
        drawn with the SAME keys and distributions as _flat_specaugment
        (batch_mask_keep is the mask-producing half of batch_mask), so the
        RNG stream is identical to the unfused chain."""
        b = config.batch_size
        if training:
            k_t, k_f = jax.random.split(k_aug)
            tmask = batch_mask_keep(k_t, b, config.n_frame,
                                    max_mask_size=24, n_mask=6)
            fm = batch_mask_keep(k_f, b, freq, max_mask_size=16, n_mask=1)
            fm = jnp.pad(fm, ((0, 0), (0, f_r - freq)), constant_values=1.0)
            fmask = jnp.tile(fm, (1, half))
        else:
            tmask = jnp.ones((b, config.n_frame), jnp.float32)
            fmask = jnp.ones((b, half * f_r), jnp.float32)
        if use_filter and variant != 'density':
            fmask = fmask * flat_filter_cols
        (mel_tc, mm), y = sample_batch(
            k_mix, banks, b, config.n_frame,
            n_classes=(banks.voice_labels.shape[-1] if n_classes is None
                       else n_classes),
            max_voices=config.max_voices, max_noises=config.max_noises,
            min_ratio=1.0, snr=config.snr, use_pallas=True, layout='tfc',
            magnitude='flat',
            mel_pack=(jnp.asarray(mel_flat2d), tmask.T, fmask))
        mel = jnp.swapaxes(
            mel_tc.reshape(b, config.n_frame, config.n_mels, half), 1, 2)
        if variant == 'density':
            _, y = label_maps.to_density_labels(mel, y)
        else:
            _, y = label_maps.to_frame_labels(mel, y)
        if use_minmax or variant == 'density':
            mn = mm[:, 0, 0][:, None, None, None]
            mx = mm[:, 0, 1][:, None, None, None]
            mel = safe_div(mel - mn, mx - mn)
        mel = jnp.log(mel + EPSILON)
        if variant == 'density':
            _, y = label_maps.preprocess_labels(config.mse_multiplier)(mel, y)
            return mel, y
        if config.v in LABEL_DOWNSAMPLE_MODELS:
            _, y = label_maps.label_downsample(32)(mel, y)
        elif config.v == 5:
            res = config.n_frame // (config.n_frame * 256 // 16000)
            _, y = label_maps.label_downsample(res)(mel, y)
        if loss_is_mse:
            y = y * config.mse_multiplier
        return mel, y

    def fn(key, banks: Banks):
        k_mix, k_aug, k_chan = jax.random.split(key, 3)
        if fused_mel and pallas_synth_eligible(banks, config.n_frame):
            return _fused_mel_fn(k_mix, k_aug, banks)
        # the non-'se' paths reduce to mel, so they run in the
        # synthesis-native time-major layout end-to-end (no relayout pass);
        # the 'se' path keeps the reference [B, freq, T, chan] layout its
        # model consumes. Identical values either way. With fused_mag the
        # spec is the channel-major flat MAGNITUDE [B, T, (chan/2)*f_r]
        # straight from synthesis — masks, the stft filter and the
        # (block-diagonal) mel projection all run on that single layout.
        lay = 'ftc' if se_v9 else 'tfc'
        t_ax, f_ax = (-2, -3) if lay == 'ftc' else (-3, -2)
        spec, y = sample_batch(
            k_mix, banks, config.batch_size, config.n_frame,
            n_classes=(banks.voice_labels.shape[-1] if n_classes is None
                       else n_classes),
            max_voices=config.max_voices,
            max_noises=config.max_noises, min_ratio=1.0,
            snr=config.snr, seperate_noise_voice=se_v9,
            use_pallas=use_pallas, layout=lay,
            magnitude='flat' if fused_mag else False)

        if fused_mag:
            assert spec.shape[-1] == half * f_r, spec.shape

        def aug(spec):
            if fused_mag:
                return _flat_specaugment(k_aug, spec)
            return batch_specaugment(k_aug, spec,
                                     time_axis=t_ax, freq_axis=f_ax)

        def to_mel(spec):
            if fused_mag:
                return jnp.einsum('btx,xmc->bmtc', spec, mel_big,
                                  precision=jax.lax.Precision.HIGHEST)
            return complex_to_mel(spec, mel_m, layout=lay)

        if variant == 'density':
            spec, y = label_maps.to_density_labels(spec, y)
            if training:
                spec = aug(spec)
            mel = to_mel(spec)
            axis = tuple(range(1, mel.ndim))
            mmax = jnp.max(mel, axis=axis, keepdims=True)
            mmin = jnp.min(mel, axis=axis, keepdims=True)
            mel = jnp.log(safe_div(mel - mmin, mmax - mmin) + EPSILON)
            _, y = label_maps.preprocess_labels(config.mse_multiplier)(mel, y)
            return mel, y

        if se_v9:
            spec, y = label_maps.speech_enhancement_preprocess(spec, y)
            return label_maps.label_downsample(32)(spec, y)

        spec, y = label_maps.to_frame_labels(spec, y)
        if training:
            spec = aug(spec)
        if config.n_chan == 1:
            spec, y = label_maps.mono_chan(spec, y)
        elif config.n_chan == 3:
            spec = label_maps.stereo_mono(spec)
        elif config.n_chan > 3:
            # per-sample independent mix factors (a plain batched
            # random_merge_aug call would broadcast ONE draw over the batch)
            spec = batch_random_merge_aug(config.n_chan)(k_chan, spec)
        if use_filter:
            if fused_mag:
                spec = spec * flat_filter_cols
            else:
                spec = stft_filter(filter_num, freq_axis=f_ax)(spec)

        mel = to_mel(spec)
        if use_minmax:
            mel = minmax(mel)
        mel = jnp.log(mel + EPSILON)

        if config.v in LABEL_DOWNSAMPLE_MODELS:
            _, y = label_maps.label_downsample(32)(mel, y)
        elif config.v == 5:
            res = config.n_frame // (config.n_frame * 256 // 16000)
            _, y = label_maps.label_downsample(res)(mel, y)
        if loss_is_mse:
            y = y * config.mse_multiplier
        return mel, y

    return jax.jit(fn) if jit else fn


class DevicePipeline:
    """Infinite iterator of on-device batches (replaces tf.data + prefetch:
    JAX's async dispatch pipelines the next batch's synthesis behind the
    current step automatically)."""

    def __init__(self, banks: Banks, config: Config, training: bool = True,
                 variant: str = 'sj', n_classes: Optional[int] = None,
                 seed: Optional[int] = None):
        # commit host-built banks once: feeding numpy leaves to the jitted
        # feature fn would re-upload the whole dataset on EVERY batch
        self.banks = jax.tree.map(jnp.asarray, banks)
        self.fn = make_feature_fn(config, training, variant, n_classes)
        base = config.seed if seed is None else seed
        self.key = jax.random.PRNGKey(base + (0 if training else 1))

    def __iter__(self):
        while True:
            # one eager split per 64 batches: eager ops cost a host->device
            # round trip each, which would serialize the training loop
            keys = jax.random.split(self.key, 65)
            self.key = keys[0]
            for k in keys[1:]:
                yield self.fn(k, self.banks)

    def take(self, n: int):
        it = iter(self)
        return [next(it) for _ in range(n)]


class _RawPipeline:
    """Reference-shaped raw pipeline: yields single (spec [freq, n_frame,
    chan], label [max_voices, n_frame, n_classes]) samples like the
    tf.data.Dataset returned by the reference's make_pipeline
    (pipeline.py:113-175)."""

    def __init__(self, banks: Banks, n_frame: int, max_voices: int,
                 max_noises: int, n_classes: int, seed: int = 0, **kwargs):
        self.banks = banks
        self.key = jax.random.PRNGKey(seed)
        # bare make_pipeline inherits merge_complex_specs' min_ratio=2/3
        # default in the reference (pipeline.py:12 via **kwargs); the
        # training entry overrides it to 1 explicitly (sj_train.py:98)
        kwargs.setdefault('min_ratio', 2 / 3)
        self._sample = functools.partial(
            sample_batch, batch_size=1, n_frame=n_frame, n_classes=n_classes,
            max_voices=max_voices, max_noises=max_noises, **kwargs)

    def __iter__(self):
        while True:
            self.key, k = jax.random.split(self.key)
            spec, label = self._sample(k, self.banks)
            yield spec[0], jax.tree.map(lambda a: a[0], label)

    def take(self, n: int):
        it = iter(self)
        return [next(it) for _ in range(n)]


def make_pipeline(backgrounds, voices, labels, noises=None, n_frame: int = 300,
                  max_voices: int = 10, max_noises: int = 10,
                  n_classes: int = 3, seed: int = 0, **kwargs) -> _RawPipeline:
    """API-parity constructor (reference: pipeline.py:113-175): ragged host
    lists in, an iterable of raw (complex_spec, per-voice labels) out."""
    assert len(backgrounds[0].shape) == 3, 'each spec must be a 3D-tensor'
    assert len(voices) == len(labels)
    labels = np.asarray(labels)
    assert labels[0].ndim == 1 and labels[0].shape[0] == n_classes, \
        'labels must be in the form of [n_samples, n_classes]'
    banks = build_banks(backgrounds, voices, labels, noises,
                        n_classes=n_classes, one_hot=False, n_frame=n_frame)
    return _RawPipeline(banks, n_frame, max_voices, max_noises, n_classes,
                        seed=seed, **kwargs)
