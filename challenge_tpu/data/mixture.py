"""On-device mixture synthesis (reference: pipeline.py:6-110).

`merge_complex_specs` rebuilds the reference's per-sample synthesis — tile +
random-crop a background, place 1..max_voices SNR-scaled voices at random
offsets with overlap rejection, add 0..max_noises noises at 0..-20 dB — as a
fixed-shape jittable function of explicit PRNG keys. Data-dependent control
flow (number of voices/noises, overlap rejection) becomes masking + a short
`lax.scan` over the voice axis; all array shapes are static.

`sample_batch` is the bank-level batched version: one fused gather per source
(background / voices / noises) pulls every window for the whole batch straight
out of HBM-resident SpecBanks, so batch synthesis is three gathers, one scan
over <=max_voices label frames, and a weighted sum — no host involvement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from challenge_tpu.data.specset import SpecBank


class Banks(NamedTuple):
    backgrounds: SpecBank
    voices: SpecBank
    voice_labels: jax.Array          # [Nv, n_classes] one-hot
    noises: Optional[SpecBank] = None


def _dyn_randint(key, maxval):
    """uniform int in [0, maxval) with traced maxval (>=1 enforced)."""
    maxval = jnp.maximum(maxval, 1)
    u = jax.random.uniform(key, ())
    return jnp.floor(u * maxval.astype(jnp.float32)).astype(jnp.int32)


def _window_indices(key, length, n_frame: int, min_ratio: float,
                    crop_style: bool):
    """Random placement of a clip of ``length`` frames into an ``n_frame``
    window, reproducing the reference's pad-then-random-crop (pipeline.py:57-74
    for voices, 96-103 for noises).

    Returns (idx [n_frame] int32 clip indices, valid [n_frame] bool).
    crop_style=True uses tf.image.random_crop's inclusive offset range
    (noises); False uses tf.random.uniform's exclusive range (voices).
    """
    pad = n_frame - jnp.floor(min_ratio * length.astype(jnp.float32)).astype(jnp.int32)
    pad = jnp.maximum(pad, 0)
    padded_len = length + 2 * pad
    span = padded_len - n_frame
    maxval = span + 1 if crop_style else span
    offset = _dyn_randint(key, maxval)
    idx = jnp.arange(n_frame, dtype=jnp.int32) + (offset - pad)
    valid = (idx >= 0) & (idx < length)
    # clip both ends: OOB gathers would otherwise fill with NaN, and
    # 0 * NaN = NaN would leak through the valid mask
    return jnp.clip(idx, 0, jnp.maximum(length - 1, 0)), valid


def _background_indices(key, bg_len, n_frame: int):
    """Tile-then-random-crop (reference: pipeline.py:29-35) as modular gather."""
    n_tile = -(-n_frame // jnp.maximum(bg_len, 1))  # ceil
    tile_len = n_tile * bg_len
    offset = _dyn_randint(key, tile_len - n_frame + 1)
    return (offset + jnp.arange(n_frame, dtype=jnp.int32)) % jnp.maximum(bg_len, 1)


def _accept_scan(l_frames, active, n_frame: int, n_classes: int):
    """Sequential overlap rejection (reference: pipeline.py:78-84).

    l_frames: [V, n_frame, n_classes] candidate per-voice frame labels.
    active:   [V] bool (voice index < n_voices).
    Returns accept [V] float32 given that earlier accepted voices' labels
    accumulate and a new voice is rejected if any (frame, class) would reach 2.
    """
    def body(acc, xs):
        l_v, act = xs
        no_overlap = (jnp.max(acc + l_v) < 2.0)
        accept = jnp.where(act, no_overlap.astype(jnp.float32), 0.0)
        return acc + l_v * accept, accept

    acc0 = jnp.zeros((n_frame, n_classes), jnp.float32)
    _, accept = jax.lax.scan(body, acc0, (l_frames, active))
    return accept


@functools.partial(jax.jit, static_argnames=(
    'n_frame', 'n_classes', 'min_ratio', 'min_noise_ratio', 'snr',
    'seperate_noise_voice'))
def merge_complex_specs(key,
                        background,          # [freq, Tb, chan]
                        voices_and_labels,   # ([V, freq, Tv, chan], [V, n_classes])
                        noises=None,         # [N, freq, Tn, chan]
                        n_frame: int = 300,
                        n_classes: int = 3,
                        min_ratio: float = 2 / 3,
                        min_noise_ratio: float = 1 / 2,
                        snr: float = -20,
                        seperate_noise_voice: bool = False,
                        bg_len=None, voice_lens=None, noise_lens=None):
    """Single-sample synthesis with the reference's exact semantics.

    Lengths default to the full padded extents (matching the reference, where
    tf.shape sees the padded-batch length, pipeline.py:51). API keeps the
    reference's (background, (voices, labels), noises) ordering; keys are
    explicit. The reference's misspelled ``seperate_noise_voice`` kwarg is
    preserved as API.
    """
    voices, labels = voices_and_labels
    freq, tb, chan = background.shape
    v, _, tv, _ = voices.shape
    bg_len = jnp.asarray(tb if bg_len is None else bg_len, jnp.int32)
    voice_len = jnp.asarray(tv if voice_lens is None else jnp.max(voice_lens),
                            jnp.int32)

    k_bg, k_nv, k_voice, k_noise = jax.random.split(key, 4)

    # background window
    bg_idx = _background_indices(k_bg, bg_len, n_frame)
    spec = jnp.take(background, bg_idx, axis=1)       # [freq, n_frame, chan]
    only_noise = spec
    # voices
    if v > 1:
        n_voices = jax.random.randint(k_nv, (), 1, v)
    else:
        n_voices = jnp.int32(1)
    vkeys = jax.random.split(k_voice, v)

    def place_voice(vk, voice):
        k_ratio, k_off = jax.random.split(vk)
        ratio = jnp.power(10.0, -jax.random.uniform(
            k_ratio, (), minval=0.0, maxval=-snr / 10.0))
        idx, valid = _window_indices(k_off, voice_len, n_frame, min_ratio,
                                     crop_style=False)
        win = jnp.take(voice, idx, axis=1) * valid[None, :, None].astype(voice.dtype)
        frame_mask = (jnp.max(win, axis=(0, 2)) > 0).astype(jnp.float32)
        return win, frame_mask, ratio

    wins, frame_masks, ratios = jax.vmap(place_voice)(vkeys, voices)
    l_frames = frame_masks[:, :, None] * labels[:, None, :]  # [V, n_frame, C]
    active = jnp.arange(v) < n_voices
    accept = _accept_scan(l_frames, active, n_frame, n_classes)

    voice_sum = jnp.einsum('v,vfnc->fnc', accept * ratios, wins)
    spec = spec + voice_sum
    label = l_frames * accept[:, None, None]

    # noises
    if noises is not None:
        n, _, tn, _ = noises.shape
        noise_len = jnp.asarray(tn if noise_lens is None else jnp.max(noise_lens),
                                jnp.int32)
        k_nn, k_each = jax.random.split(k_noise)
        n_noises = jax.random.randint(k_nn, (), 0, n)
        nkeys = jax.random.split(k_each, n)

        def place_noise(nk, noise):
            k_ratio, k_off = jax.random.split(nk)
            ratio = jnp.power(10.0, -jax.random.uniform(k_ratio, (), maxval=2.0))
            idx, valid = _window_indices(k_off, noise_len, n_frame,
                                         min_noise_ratio, crop_style=True)
            win = jnp.take(noise, idx, axis=1) * valid[None, :, None].astype(noise.dtype)
            return win, ratio

        nwins, nratios = jax.vmap(place_noise)(nkeys, noises)
        n_active = (jnp.arange(n) < n_noises).astype(jnp.float32)
        noise_sum = jnp.einsum('x,xfnc->fnc', n_active * nratios, nwins)
        spec = spec + noise_sum
        only_noise = only_noise + noise_sum

    if seperate_noise_voice:
        return spec, (label, voice_sum, only_noise)
    return spec, label


# --------------------------------------------------------------- bank-level
def _flat_window_gather(bank: SpecBank, item_idx, time_idx, valid=None):
    """Gather windows [..., n_frame, freq, chan] from a time-major bank with a
    single fused gather: flat index = item * T_max + t."""
    n, t_max, freq, chan = bank.data.shape
    flat = bank.data.reshape(n * t_max, freq, chan)
    idx = item_idx[..., None] * t_max + time_idx
    out = flat[idx]
    if valid is not None:
        out = out * valid[..., None, None].astype(out.dtype)
    return out


@functools.partial(jax.jit, static_argnames=(
    'batch_size', 'n_frame', 'n_classes', 'max_voices', 'max_noises',
    'min_ratio', 'min_noise_ratio', 'snr', 'seperate_noise_voice'))
def sample_batch(key, banks: Banks, batch_size: int, n_frame: int,
                 n_classes: int = 3, max_voices: int = 7, max_noises: int = 2,
                 min_ratio: float = 1.0, min_noise_ratio: float = 1 / 2,
                 snr: float = -20.0, seperate_noise_voice: bool = False):
    """Synthesize a whole training batch on device.

    Equivalent to ``batch_size`` draws from the reference's zipped shuffled
    streams + ``merge_complex_specs`` map (pipeline.py:141-175), but phrased
    as three fused gathers from HBM-resident banks.

    Returns (spec [B, freq, n_frame, chan], label [B, max_voices, n_frame,
    n_classes]) — or with ``seperate_noise_voice`` the reference's
    (spec, (label, only_voice, only_noise)) triple.
    """
    b = batch_size
    bg, vo, no = banks.backgrounds, banks.voices, banks.noises
    keys = jax.random.split(key, 8)

    # ----- source draws (reference: repeat().shuffle() streams)
    bidx = jax.random.randint(keys[0], (b,), 0, bg.n)
    vidx = jax.random.randint(keys[1], (b, max_voices), 0, vo.n)

    # ----- background windows
    bg_lens = bg.lens[bidx]
    bg_tidx = jax.vmap(_background_indices, in_axes=(0, 0, None))(
        jax.random.split(keys[2], b), bg_lens, n_frame)
    spec = _flat_window_gather(bg, bidx, bg_tidx)      # [B, n_frame, freq, chan]
    only_noise = spec

    # ----- voices
    n_voices = (jax.random.randint(keys[3], (b,), 1, max_voices)
                if max_voices > 1 else jnp.ones((b,), jnp.int32))
    # padded-batch semantics: every voice in a sample is treated as having the
    # max length among that sample's draw (reference: pipeline.py:51,155-156)
    v_eff = jnp.max(vo.lens[vidx], axis=1)             # [B]
    vkeys = jax.random.split(keys[4], b * max_voices).reshape(b, max_voices, 2)
    ratio_u = jax.random.uniform(keys[5], (b, max_voices),
                                 minval=0.0, maxval=-snr / 10.0)
    ratios = jnp.power(10.0, -ratio_u)

    def voice_idx(vk, length):
        return _window_indices(vk, length, n_frame, min_ratio, crop_style=False)

    v_tidx, v_valid = jax.vmap(jax.vmap(voice_idx, in_axes=(0, None)),
                               in_axes=(0, 0))(vkeys, v_eff)
    wins = _flat_window_gather(vo, vidx, v_tidx, v_valid)  # [B,V,n_frame,freq,chan]
    frame_mask = (jnp.max(wins, axis=(3, 4)) > 0).astype(jnp.float32)  # [B,V,n]
    labels_bv = banks.voice_labels[vidx]                   # [B, V, C]
    l_frames = frame_mask[..., None] * labels_bv[:, :, None, :]  # [B,V,n,C]
    active = jnp.arange(max_voices)[None, :] < n_voices[:, None]
    accept = jax.vmap(_accept_scan, in_axes=(0, 0, None, None))(
        l_frames, active, n_frame, n_classes)              # [B, V]

    spec = spec + jnp.einsum('bv,bvnfc->bnfc', accept * ratios, wins)
    only_voice = spec - only_noise
    label = l_frames * accept[..., None, None]

    # ----- noises
    if no is not None and max_noises > 0:
        nidx = jax.random.randint(keys[6], (b, max_noises), 0, no.n)
        k_nn, k_off, k_ratio = jax.random.split(keys[7], 3)
        n_noises = jax.random.randint(k_nn, (b,), 0, max_noises)
        n_eff = jnp.max(no.lens[nidx], axis=1)
        nkeys = jax.random.split(k_off, b * max_noises).reshape(b, max_noises, 2)
        nratios = jnp.power(
            10.0, -jax.random.uniform(k_ratio, (b, max_noises), maxval=2.0))

        def noise_idx(nk, length):
            return _window_indices(nk, length, n_frame, min_noise_ratio,
                                   crop_style=True)

        n_tidx, n_valid = jax.vmap(jax.vmap(noise_idx, in_axes=(0, None)),
                                   in_axes=(0, 0))(nkeys, n_eff)
        nwins = _flat_window_gather(no, nidx, n_tidx, n_valid)
        n_active = (jnp.arange(max_noises)[None, :] < n_noises[:, None]
                    ).astype(jnp.float32)
        noise_sum = jnp.einsum('bx,bxnfc->bnfc', n_active * nratios, nwins)
        spec = spec + noise_sum
        only_noise = only_noise + noise_sum

    # back to the reference layout [B, freq, n_frame, chan]
    spec = jnp.swapaxes(spec, 1, 2)
    if seperate_noise_voice:
        return spec, (label, jnp.swapaxes(only_voice, 1, 2),
                      jnp.swapaxes(only_noise, 1, 2))
    return spec, label
