"""Sliding-window inference and the challenge evaluation loop
(reference: metrics.py:31-90 ``evaluate``).

TPU-native structure: for each wav, the *entire* chain — STFT features,
channel maps, windowing, batched model forward over all windows, overlap-add
averaging, 0.5 s mean-pool + 2 s max-pool smoothing, thresholding — is one
jitted XLA program (compiled once per distinct audio length). Only WAV
decode and the variable-length event matching run on host.

Reference quirks preserved deliberately:
* eval always applies a ~1 kHz stft_filter for non-'se' models
  (metrics.py:50) even though training gates it on the run name;
* ``minmax`` at eval normalizes the unbatched [mel, time, chan] tensor over
  axes (1, 2) — i.e. per mel row (metrics.py:53 applying the batch-wise fn);
* ``mono_chan`` without labels is an identity (data_utils.py:73-76), so
  n_chan==1 evaluation slices channels at predict time only.
"""

from __future__ import annotations

import functools
import json
import os
import sys
from glob import glob
import jax
import jax.numpy as jnp
import numpy as np

from challenge_tpu.config import Config
from challenge_tpu.data.labels import speech_enhancement_preprocess, stereo_mono
from challenge_tpu.data.pipeline import LABEL_DOWNSAMPLE_MODELS
from challenge_tpu.models.layers import avg_pool_same
from challenge_tpu.models.registry import ModelBundle
from challenge_tpu.ops.augment import random_merge_aug, stft_filter
from challenge_tpu.ops.complexspec import complex_to_magphase
from challenge_tpu.ops.dsp import (
    load_wav_device, read_wav_raw, resample_waveform, stft)
from challenge_tpu.ops.mel import magphase_to_mel
from challenge_tpu.ops.norms import EPSILON, minmax, safe_div
from challenge_tpu.evaluate.events import (
    get_er, get_start_end_frame, output_to_metric)

SR = 16000
HOP = 256


def frame_signal(x, frame_length: int, frame_step: int, axis: int = -2):
    """tf.signal.frame(..., pad_end=True) parity: split ``axis`` into
    [n_frames, frame_length] windows, zero-padding the tail."""
    axis = axis % x.ndim
    t = x.shape[axis]
    n_frames = max(-(-t // frame_step), 1)
    full = (n_frames - 1) * frame_step + frame_length
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, max(full - t, 0))   # no pad needed if frames fit
    x = jnp.pad(x, pad)
    idx = (np.arange(n_frames)[:, None] * frame_step
           + np.arange(frame_length)[None, :])
    windows = jnp.take(x, idx.reshape(-1), axis=axis)
    new_shape = (x.shape[:axis] + (n_frames, frame_length)
                 + x.shape[axis + 1:])
    return windows.reshape(new_shape)


def overlap_and_add(frames, frame_step: int):
    """tf.signal.overlap_and_add parity: [..., n_frames, frame_len] ->
    [..., (n_frames-1)*step + frame_len] by scatter-add."""
    nf, fl = frames.shape[-2:]
    out_len = (nf - 1) * frame_step + fl
    idx = (np.arange(nf)[:, None] * frame_step
           + np.arange(fl)[None, :]).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (nf * fl,))
    out = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
    return out.at[..., idx].add(flat)


def max_pool_1d_same(x, pool: int):
    """Keras MaxPooling1D(pool, 1, 'same') on [..., T, C]."""
    from flax import linen as nn
    return nn.pool(x, -jnp.inf, jax.lax.max, (pool,), (1,), 'SAME')


_INFER_CACHE: dict = {}


class BatchedEvalIneligible(Exception):
    """Raised at trace time when a config can't use the one-program devset
    path (e.g. a model whose predictions don't reconstruct the full frame
    grid — vad v1/v5-style heads without the upsample); callers fall back
    to the per-clip chain, which reproduces the reference's (equally
    resolution-degenerate) behavior for those configs."""


def _make_spec_to_grid(bundle: ModelBundle, config: Config,
                       overlap_hop: int, mesh=None):
    """The shared eval chain body: complex spec [freq, T, chan*2] (+
    optionally the number of VALID leading frames) -> thresholded 0/1
    frame grid [T, n_classes].

    ``n_valid`` (traced) marks how many leading frames hold real signal
    when the spec is zero-padded to a common length (the batched devset
    path). Every mask below is exactly the identity when n_valid == T, so
    the unbatched path (n_valid=None) is bit-identical to the pre-mask
    implementation:
      * minmax reduces over valid frames only (the reference normalizes
        over the clip's true extent);
      * features beyond n_valid are zeroed (== tf.signal.frame's zero
        padding of the true-length tensor, metrics.py:60);
      * smoothing pools divide by / take max over valid frames only (the
        reference pools an array that ENDS at the true length).
    """
    mel_fn = magphase_to_mel(config.n_mels)
    n_frame = config.n_frame
    # n_chan > 3 evaluation draws random channel-mix factors per clip like
    # the reference (metrics.py:46 calls random_merge_aug inside the
    # per-clip loop with fresh TF randoms); here the draw is the fixed base
    # key folded with the clip's index — fresh per clip, but DETERMINISTIC
    # across evaluate() calls/processes (a documented deviation: the
    # reference reseeds from the global TF RNG every run)
    merge_key = jax.random.PRNGKey(0)

    def _shard_windows(windows):
        if mesh is None:
            return windows
        from challenge_tpu.parallel.mesh import batch_sharding
        n_dev = mesh.devices.size
        pad = (-windows.shape[0]) % n_dev
        if pad:
            # padded windows only touch output frames >= frame_len, which
            # the overlap-add slice drops
            windows = jnp.concatenate(
                [windows, jnp.zeros((pad,) + windows.shape[1:],
                                    windows.dtype)], axis=0)
        return jax.lax.with_sharding_constraint(
            windows, batch_sharding(mesh))

    def spec_to_grid(variables, spec, n_valid=None, clip_seed=None):
        if config.n_chan == 3:
            spec = stereo_mono(spec)
        elif config.n_chan > 3:
            key = merge_key if clip_seed is None else \
                jax.random.fold_in(merge_key, clip_seed)
            spec = random_merge_aug(config.n_chan)(key, spec)
        # (n_chan == 1: identity — reference mono_chan quirk)

        t_total = spec.shape[-2]
        valid_t = None if n_valid is None else \
            (jnp.arange(t_total) < n_valid)

        if config.model_type != 'se':
            spec = stft_filter(int(round(256 * 1000 / 16000)))(spec)
            x = complex_to_magphase(spec)
            x = mel_fn(x)                       # [mel, T, chan]
            if valid_t is None:
                x = minmax(x)                   # per-mel-row (quirk)
            else:
                m = valid_t[None, :, None]
                x_max = jnp.max(jnp.where(m, x, -jnp.inf), axis=(1, 2),
                                keepdims=True)
                x_min = jnp.min(jnp.where(m, x, jnp.inf), axis=(1, 2),
                                keepdims=True)
                x = safe_div(x - x_min, x_max - x_min)
            x = jnp.log(x + EPSILON)
        else:
            x = speech_enhancement_preprocess(spec)  # [256, T, chan]
        if valid_t is not None:
            x = jnp.where(valid_t[None, :, None], x, 0.0)

        frame_len = x.shape[-2]
        windows = frame_signal(x, n_frame, overlap_hop, axis=-2)
        # [mel, W, n_frame, chan] -> [W, mel, n_frame, chan]
        windows = jnp.transpose(windows, (1, 0, 2, 3))
        # frames actually covered by the REAL windows: mesh padding adds
        # windows whose (zero-count) output region would otherwise extend
        # the grid with 0/0 NaNs that bleed into the smoothing pools when
        # overlap_hop > n_frame (a degenerate-but-reference-legal config)
        covered = (windows.shape[0] - 1) * overlap_hop + n_frame
        windows = _shard_windows(windows)
        preds = bundle.apply(variables, windows[..., :config.n_chan],
                             training=False)
        if config.model_type == 'se' and config.v == 9:
            preds = preds[0]

        if config.v in LABEL_DOWNSAMPLE_MODELS:
            resolution = n_frame // preds.shape[-2]
            preds = jnp.repeat(preds, resolution, axis=-2)  # UpSampling1D

        preds = jnp.transpose(preds, (2, 0, 1))             # [C, W, T]
        counts = overlap_and_add(jnp.ones_like(preds), overlap_hop)
        preds = overlap_and_add(preds, overlap_hop)
        preds = (preds / counts)[..., :min(frame_len, covered)]
        preds = jnp.transpose(preds, (1, 0))                # [T, C]

        k = int(0.5 * SR) // HOP                            # 31 frames
        if valid_t is None:
            preds = avg_pool_same(preds, (k,), (1,))
            preds = max_pool_1d_same(preds, k * 4)
            return (preds >= 0.5).astype(jnp.float32)
        if preds.shape[0] != t_total:
            raise BatchedEvalIneligible(
                f'model output length {preds.shape[0]} != spectrogram '
                f'frames {t_total} — per-clip eval only for this config')
        vm = valid_t[:, None].astype(preds.dtype)
        from flax import linen as nn
        summed = nn.pool(preds * vm, 0., jax.lax.add, (k,), (1,), 'SAME')
        cnt = nn.pool(jnp.broadcast_to(vm, preds.shape), 0., jax.lax.add,
                      (k,), (1,), 'SAME')
        preds = summed / jnp.maximum(cnt, 1.0)
        preds = max_pool_1d_same(
            jnp.where(vm > 0, preds, -jnp.inf), k * 4)
        return ((preds >= 0.5) & (vm > 0)).astype(jnp.float32)

    return spec_to_grid


def make_infer_fn(bundle: ModelBundle, config: Config,
                  overlap_hop: int = 512, mesh=None):
    """Build the jitted per-file chain: complex spec [freq, T, chan*2] ->
    thresholded 0/1 frame grid [T, n_classes].

    With a ``mesh`` the sliding-window batch is sharded across the data axis
    (windows are independent, so long-audio inference scales linearly with
    chips — SURVEY §5.7: sequence length is traded for batch)."""
    # linen modules are frozen dataclasses -> hashable by value, so two
    # bundles of the same architecture share one compiled program
    cache_key = ('single', bundle.module, config.model_type, config.v,
                 config.n_mels, config.n_frame, config.n_chan,
                 overlap_hop, mesh)
    cached = _INFER_CACHE.get(cache_key)
    if cached is not None:
        return cached

    spec_to_grid = _make_spec_to_grid(bundle, config, overlap_hop, mesh)

    if config.n_chan > 3:
        # per-clip channel-mix seed (see _make_spec_to_grid); only this
        # family takes the extra arg so every other config's compiled
        # signature is unchanged. REQUIRED (no default): omitting it would
        # silently give every clip the seed-0 mix — the fixed-key bug this
        # argument exists to fix.
        @jax.jit
        def infer(variables, spec, clip_seed):
            return spec_to_grid(variables, spec, clip_seed=clip_seed)
    else:
        @jax.jit
        def infer(variables, spec):
            return spec_to_grid(variables, spec)

    _INFER_CACHE[cache_key] = infer
    return infer


def _wav_headers(paths, sr: int = SR):
    """Header-only scan: (sample counts [N], bytes per padded clip) or None
    when the set is ineligible for the batched path (mixed widths/channels,
    non-16k rate). Used to size eval chunks without reading any PCM."""
    import wave as wave_mod
    lens, chans = [], set()
    try:
        for p in paths:
            with wave_mod.open(p, 'rb') as f:
                if f.getsampwidth() != 2 or f.getframerate() != sr:
                    return None
                chans.add(f.getnchannels())
                lens.append(f.getnframes())
    except Exception:
        return None
    if len(chans) != 1:
        return None
    return np.asarray(lens), chans.pop()


def _prepare_batched_pcm(paths, sr: int = SR, n_fft: int = 512,
                         s_max: int = None):
    """Host side of the one-program devset eval: read every 16-bit wav and
    zero-fill to the longest clip (or to ``s_max`` samples — the chunked
    path forces one row length across chunks so every chunk reuses one
    compiled program). Resampling, RMS and the STFT reflect padding all
    happen on device (:func:`_pcm_row_to_spec`).

    Returns (pcm int16 [N, chan, S_max], sample_lens [N]) or None when the
    set is ineligible (mixed widths/channels, non-16k rate, a clip shorter
    than the STFT reflection pad, or longer than ``s_max``) — callers fall
    back to the per-clip path."""
    pad = n_fft // 2
    rows = []
    for p in paths:
        raw, rate = read_wav_raw(p)
        if raw is None or rate != sr or raw.shape[1] <= pad:
            return None
        rows.append(raw)
    if len({r.shape[0] for r in rows}) != 1:
        return None
    n, chan = len(rows), rows[0].shape[0]
    if s_max is None:
        s_max = max(r.shape[1] for r in rows)
    elif any(r.shape[1] > s_max for r in rows):
        return None
    out = np.zeros((n, chan, s_max), '<i2')
    lens = np.zeros((n,), np.int32)
    for i, r in enumerate(rows):
        out[i, :, :r.shape[1]] = r
        lens[i] = r.shape[1]
    return out, lens


def _pcm_row_to_spec(pcm_i, s_i, sr: int = SR, n_fft: int = 512,
                     hop: int = HOP):
    """Device-side ingest of ONE zero-filled PCM row: the exact
    :func:`challenge_tpu.ops.dsp.wav_to_spec` chain — same-rate Kaldi
    resample (NOT the identity: the 0.99-nyquist lowpass the reference
    applies unconditionally, data_utils.py:20-21), RMS/10 over the true
    samples, reflect-padded STFT — with the clip's true length ``s_i``
    traced so one compiled program serves the whole batch.

    pcm_i: int16 [chan, S_row] (samples beyond ``s_i`` zero).
    Returns (spec [freq, T_row, chan*2], n_valid) with the first
    ``n_valid`` frames bit-identical to ``wav_to_spec`` on the unpadded
    clip (pinned by tests)."""
    pad = n_fft // 2
    wav = pcm_i.astype(jnp.float32) / 32768.0          # [chan, S_row]
    res = resample_waveform(wav, sr, sr)
    # boundary taps bleed ~W/2 nonzero samples past s_i; zero them so the
    # RMS and the reflected tail see exactly the true-length signal
    pos = jnp.arange(res.shape[-1])
    res = res * (pos < s_i)
    denom = (s_i * wav.shape[0]).astype(jnp.float32)
    rms = jnp.sqrt(jnp.sum(jnp.square(res)) / denom) * 10.0
    res = res / rms
    # torch.stft(center=True) reflect padding with a traced clip length:
    # the left pad mirrors the (always-valid) head statically; the right
    # pad mirrors around s_i - 1 and lands at a dynamic offset
    chan = res.shape[0]
    left = res[:, 1:pad + 1][:, ::-1]
    buf = jnp.concatenate(
        [left, res, jnp.zeros((chan, 2 * pad), res.dtype)], axis=-1)
    right = jax.lax.dynamic_slice(
        res, (0, s_i - 1 - pad), (chan, pad))[:, ::-1]
    buf = jax.lax.dynamic_update_slice(buf, right, (0, pad + s_i))
    real, imag = stft(buf, n_fft, hop, center=False)   # [chan, freq, T_row]
    spec = jnp.stack([real, imag], axis=0)             # [2, C, freq, T]
    spec = jnp.transpose(spec, (2, 3, 0, 1))           # [freq, T, 2, C]
    spec = spec.reshape(*spec.shape[:2], -1)
    return spec, s_i // hop + 1


def devset_infer_body(bundle: ModelBundle, config: Config,
                      overlap_hop: int = 512, sr: int = SR,
                      n_fft: int = 512, hop: int = HOP):
    """The raw (unjitted) whole-devset eval chain, shared by
    :func:`make_devset_infer_fn` and the AOT eval export
    (interop/aot.py:export_eval). Returns ``(body, takes_seed)`` with
    ``body(variables, pcm, lens, seeds) -> grids`` — seeds are only read
    when ``takes_seed`` (n_chan > 3 per-clip channel mixes)."""
    spec_to_grid = _make_spec_to_grid(bundle, config, overlap_hop)
    takes_seed = config.n_chan > 3   # per-clip channel-mix seeds

    def _infer_body(variables, pcm, lens, seeds):
        def one(pcm_i, s_i, seed_i):
            spec, n_valid = _pcm_row_to_spec(pcm_i, s_i, sr, n_fft, hop)
            return spec_to_grid(variables, spec, n_valid=n_valid,
                                clip_seed=seed_i if takes_seed else None)

        return jax.vmap(one)(pcm, lens, seeds)

    return _infer_body, takes_seed


def make_devset_infer_fn(bundle: ModelBundle, config: Config,
                         overlap_hop: int = 512, sr: int = SR,
                         n_fft: int = 512, hop: int = HOP, mesh=None):
    """One XLA program for the WHOLE eval set: zero-filled int16 PCM
    [N, chan, S_row] + true sample counts -> all thresholded frame grids
    [N, T_row, n_classes] (each clip's first ``lens[i]//hop + 1`` rows
    valid). One host->device transfer, one dispatch, one fetch — the
    per-clip path pays a tunnel round trip per clip instead.

    With a ``mesh`` the clip axis is sharded over the data axis (callers
    pad N to a multiple of the device count), so the whole corpus
    evaluates embarrassingly parallel across chips.

    Matches the per-clip chain exactly (pinned by tests): each row runs
    the full ``wav_to_spec`` ingest — including the same-rate Kaldi
    lowpass the reference applies to every clip — via
    :func:`_pcm_row_to_spec` (true-length RMS, traced-length reflection
    pad), and every downstream reduction masks to the clip's valid frames
    (see _make_spec_to_grid). The only tolerance is f32 reduction-order
    noise in the RMS sum over the zero-filled row; the thresholded grids
    are pinned bit-identical."""
    cache_key = ('devset', bundle.module, config.model_type, config.v,
                 config.n_mels, config.n_frame, config.n_chan,
                 overlap_hop, sr, n_fft, hop, mesh)
    cached = _INFER_CACHE.get(cache_key)
    if cached is not None:
        return cached

    _infer_body, takes_seed = devset_infer_body(bundle, config, overlap_hop,
                                                sr, n_fft, hop)

    if takes_seed:
        infer_all = _infer_body   # callers pass the [N] global clip seeds
    else:
        def infer_all(variables, pcm, lens):
            dummy = jnp.zeros(lens.shape, jnp.int32)   # unused (dead code)
            return _infer_body(variables, pcm, lens, dummy)

    if mesh is None:
        jitted = jax.jit(infer_all)
    else:
        from challenge_tpu.parallel.mesh import batch_sharding, replicated
        b_sh = batch_sharding(mesh)
        in_sh = (replicated(mesh),) + (batch_sharding(mesh),) * \
            (3 if takes_seed else 2)
        jitted = jax.jit(infer_all, in_shardings=in_sh, out_shardings=b_sh)
    _INFER_CACHE[cache_key] = jitted
    return jitted


_DEVICE_PCM_CACHE: dict = {}

# PCM working-set budget of ONE one-program eval chunk (the program's
# spectrogram intermediates are ~20x the PCM bytes); corpora beyond it are
# evaluated as equal-shape chunks sharing one compiled program
_BATCH_PCM_CAP_BYTES = 48 * 1024 * 1024


def _device_pcm(paths, max_entries: int = 4, pad_clips_to: int = 1,
                s_max: int = None, use_cache: bool = True):
    """Device-resident eval corpus: the padded int16 PCM batch, uploaded
    ONCE and reused across evaluate() calls (keyed by path+mtime+size).
    Eval corpora are immutable and small (~23 MB for 6x60 s), and on a
    remote-attached TPU the fresh upload is the entire eval floor
    (~0.5 s at the tunnel's ~45 MB/s) — exactly the recurring cost the
    reference's every-5-epochs eval callback would otherwise pay.

    ``pad_clips_to``: round the clip count up to a multiple (the chunk
    size, itself a multiple of the mesh device count) with constant dummy
    clips (results sliced off by the caller; a nonzero constant keeps
    their masked RMS finite). ``s_max``: force the padded row length (the
    chunked path shares it across chunks for program reuse)."""
    try:
        key = (pad_clips_to, s_max) + tuple(
            (p, os.path.getmtime(p), os.path.getsize(p)) for p in paths)
    except OSError:
        return None
    hit = _DEVICE_PCM_CACHE.get(key) if use_cache else None
    if hit is not None:
        # LRU: a hit moves to the back so sequential multi-chunk scans
        # evict the longest-unused entry, not the next one needed
        _DEVICE_PCM_CACHE.pop(key)
        _DEVICE_PCM_CACHE[key] = hit
        return hit
    prep = _prepare_batched_pcm(paths, s_max=s_max)
    if prep is None:
        return None
    pcm, lens = prep
    n_pad = (-len(paths)) % max(pad_clips_to, 1)
    if n_pad:
        dummy = np.full((n_pad,) + pcm.shape[1:], 1000, pcm.dtype)
        pcm = np.concatenate([pcm, dummy], axis=0)
        lens = np.concatenate(
            [lens, np.full((n_pad,), HOP * 4, lens.dtype)])
    entry = (jnp.asarray(pcm), jnp.asarray(lens), lens)
    if use_cache:
        while len(_DEVICE_PCM_CACHE) >= max_entries:
            _DEVICE_PCM_CACHE.pop(next(iter(_DEVICE_PCM_CACHE)))
        _DEVICE_PCM_CACHE[key] = entry
    return entry


@functools.lru_cache(maxsize=32)
def _stack_pad_fn(lengths, n_classes):
    """One jitted program stacking variable-length [T_i, C] grids into a
    single [N, T_max, C] array, so the whole dev set's grids come back in
    ONE device->host transfer instead of a ~30 ms tunnel round trip per
    clip. Cached per distinct length tuple (the dev set's lengths are fixed,
    so this compiles once and stays warm)."""
    t_max = max(lengths)

    @jax.jit
    def stack(*grids):
        return jnp.stack([
            jnp.pad(g, ((0, t_max - g.shape[0]), (0, 0))) for g in grids])
    return stack


def evaluate(config: Config, bundle: ModelBundle, variables,
             overlap_hop: int = 512, verbose: bool = False,
             eval_dir: str = '.', answer_path: str = 'sample_answer.json',
             mesh=None, max_in_flight: int = 8, batched: bool = True):
    """Challenge evaluation over ``eval_dir/*.wav``
    (reference: metrics.py:31-90). Returns the per-clip ER list.

    ``batched=True`` (default) evaluates the whole directory as ONE XLA
    program — one upload, one dispatch, one fetch — whenever the wav set
    is eligible (uniform 16-bit/16 kHz/channels); otherwise it falls back
    to the pipelined per-clip loop. Identical grids either way (pinned by
    tests). With a ``mesh`` the batched program shards the clip axis over
    the data axis (clip count padded to the device count), and the
    per-clip fallback shards each clip's window batch instead."""
    with open(os.path.join(eval_dir, answer_path)
              if not os.path.isabs(answer_path) else answer_path) as f:
        answer_gt = json.load(f)['task2_answer']

    to_metric = output_to_metric(HOP, SR)
    paths = sorted(glob(os.path.join(eval_dir, '*.wav')))

    host_grids = None
    if batched and len(paths) > 1:
        pad_to = int(mesh.devices.size) if mesh is not None else 1
        # one program materializes a chunk's spectrograms at once (~20x the
        # PCM bytes); size chunks to a ~48 MB PCM working set. A corpus that
        # fits one chunk runs exactly the original single-shot path; larger
        # corpora run as equal-shape chunks (clip count and row length
        # padded identically) so EVERY chunk reuses one compiled program —
        # measured 15.7 ms/clip vs the per-clip fallback's ~250 ms/clip on
        # a remote-attached v5e at 48x60 s.
        cap = _BATCH_PCM_CAP_BYTES
        chunk_plan = None
        hdr = _wav_headers(paths)
        if hdr is not None:
            lens_all, chan = hdr
            s_max = int(lens_all.max())
            clip_bytes = chan * s_max * 2
            per_chunk = max(int(cap // max(clip_bytes, 1)), 1)
            if per_chunk >= len(paths):
                chunk_plan = ([paths], pad_to, None)     # original path
            else:
                per_chunk = max(per_chunk - per_chunk % pad_to, pad_to)
                chunk_plan = (
                    [paths[i:i + per_chunk]
                     for i in range(0, len(paths), per_chunk)],
                    per_chunk, s_max)
        if chunk_plan is not None:
            chunks, clips_to, s_force = chunk_plan
            cache_n = max(4, min(len(chunks), 32))
            # a corpus whose chunk count exceeds the cache capacity would
            # evict every entry before the pass ends (sequential scans
            # always miss) — bypass rather than pollute/pin HBM for nothing
            cacheable = len(chunks) <= cache_n
            try:
                infer_all = make_devset_infer_fn(bundle, config,
                                                 overlap_hop, mesh=mesh)
                outs, metas, clip0 = [], [], 0
                for chunk in chunks:
                    prep = _device_pcm(chunk, max_entries=cache_n,
                                       pad_clips_to=clips_to,
                                       s_max=s_force, use_cache=cacheable)
                    if prep is None:
                        outs = None
                        break
                    d_pcm, d_lens, lens = prep
                    # dispatch without blocking: uploads/execution of later
                    # chunks overlap earlier chunks' fetches
                    if config.n_chan > 3:
                        # global clip indices seed the per-clip channel
                        # mixes (fresh per clip like the reference's eval
                        # loop, deterministic across runs)
                        seeds = jnp.arange(d_pcm.shape[0],
                                           dtype=jnp.int32) + clip0
                        outs.append(infer_all(variables, d_pcm, d_lens,
                                              seeds))
                    else:
                        outs.append(infer_all(variables, d_pcm, d_lens))
                    clip0 += len(chunk)
                    metas.append((len(chunk), lens))
                if outs is not None:
                    host_grids = []
                    for out, (n_real, lens) in zip(outs, metas):
                        grids = np.asarray(out)
                        host_grids.extend(
                            grids[i, :int(s) // HOP + 1]
                            for i, s in enumerate(lens[:n_real]))
            except BatchedEvalIneligible:
                host_grids = None
            except Exception as e:   # e.g. device OOM on an outsized set
                # stderr: bench.py's stdout must stay exactly one JSON line
                print('WARNING: one-program eval failed '
                      f'({type(e).__name__}: {e}); falling back to the '
                      'per-clip loop', file=sys.stderr)
                host_grids = None

    if host_grids is None:
        infer = make_infer_fn(bundle, config, overlap_hop, mesh=mesh)
        # pipeline the clip loop: every upload (wav) and device program is
        # dispatched asynchronously before anything blocks, so per-clip
        # transfer latency — the dominant cost on remote-attached TPUs —
        # overlaps across clips. The look-ahead is bounded: past
        # ``max_in_flight`` clips the loop waits for the oldest pending
        # grid so pending wav uploads and full complex spectrograms
        # (~15-20 MB per 60 s clip) can't pile up in HBM on large eval
        # directories.
        grids = []
        for i, path in enumerate(paths):
            spec = load_wav_device(path)       # stays on device
            if config.n_chan > 3:
                grids.append(infer(variables, spec, np.int32(i)))
            else:
                grids.append(infer(variables, spec))
            if i >= max_in_flight:
                grids[i - max_in_flight].block_until_ready()
        if grids:
            # all grids in ONE device->host transfer, padded to the longest
            lengths = tuple(int(g.shape[0]) for g in grids)
            stacked = np.asarray(
                _stack_pad_fn(lengths, grids[0].shape[1])(*grids))
            host_grids = [stacked[i, :t] for i, t in enumerate(lengths)]
        else:
            host_grids = []
    final_score = []
    for path, grid in zip(paths, host_grids):
        cls0, cls1, cls2 = get_start_end_frame(grid)
        gt = np.asarray(answer_gt[os.path.basename(path)[:-4]])
        er = get_er(gt, to_metric(cls0, cls1, cls2))
        final_score.append(er)
    if verbose:
        print('FINAL SCORE:', np.mean(final_score))
    return final_score
