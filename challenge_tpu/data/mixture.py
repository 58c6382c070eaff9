"""On-device mixture synthesis (reference: pipeline.py:6-110).

`merge_complex_specs` rebuilds the reference's per-sample synthesis — tile +
random-crop a background, place 1..max_voices-1 SNR-scaled voices at random
offsets with overlap rejection, add 0..max_noises-1 noises at 0..-20 dB — as
a fixed-shape jittable function of explicit PRNG keys. (The upper bounds are
EXCLUSIVE: the reference draws with tf.random.uniform's exclusive maxval —
pipeline.py:43,87 — so a ``max_voices``-voice mixture never occurs; quirk
preserved.) Data-dependent control
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


def _stream_draw(key, n_items: int, shape):
    """Source indices approximating the reference's shuffled repeating
    streams (pipeline.py:143-156: ``.repeat().shuffle(len)`` then
    padded_batch): concatenated random permutations of [0, n_items), sliced
    in order.

    The match is distributional, not exact: tf.data's shuffle is a sliding
    *buffer* over a continuous repeated stream (two epochs' copies of an
    item can coexist in the buffer, so near-adjacent repeats are possible in
    the reference), while this draws whole permutations back to back
    (repeats possible only across a permutation boundary — including within
    one example's ``max_voices`` row when it spans the boundary). Long-run
    per-item frequencies are exactly uniform in both. Static shapes
    throughout: the number of permutations is ceil(prod(shape) / n_items).
    """
    count = 1
    for s in shape:
        count *= int(s)
    n_perms = -(-count // n_items)
    keys = jax.random.split(key, n_perms)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n_items))(keys)
    return perms.reshape(-1)[:count].reshape(shape).astype(jnp.int32)


def _dyn_randint(key, maxval):
    """uniform int in [0, maxval) with traced maxval (>=1 enforced)."""
    maxval = jnp.maximum(maxval, 1)
    u = jax.random.uniform(key, ())
    return jnp.floor(u * maxval.astype(jnp.float32)).astype(jnp.int32)


def _placement_draw(key, length, n_frame: int, min_ratio: float,
                    crop_style: bool):
    """The ONE random placement draw shared by the gather
    (:func:`_window_indices`) and scatter (:func:`_placement_shift`)
    formulations — they must keep identical offset distributions for
    gather/scatter (and Pallas/XLA) parity, so the pad/span/maxval math
    lives only here. Reproduces the reference's pad-then-random-crop
    (pipeline.py:57-74 for voices, 96-103 for noises); crop_style=True uses
    tf.image.random_crop's inclusive offset range (noises), False
    tf.random.uniform's exclusive range (voices).

    Returns (offset, pad): clip frame j lands at window frame
    ``j + pad - offset``.
    """
    pad = n_frame - jnp.floor(
        min_ratio * length.astype(jnp.float32)).astype(jnp.int32)
    pad = jnp.maximum(pad, 0)
    span = length + 2 * pad - n_frame
    maxval = span + 1 if crop_style else span
    return _dyn_randint(key, maxval), pad


def _window_indices(key, length, n_frame: int, min_ratio: float,
                    crop_style: bool):
    """Gather formulation of :func:`_placement_draw`: returns
    (idx [n_frame] int32 clip indices, valid [n_frame] bool)."""
    offset, pad = _placement_draw(key, length, n_frame, min_ratio,
                                  crop_style)
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
def _flat_window_gather(bank: SpecBank, item_idx, time_idx):
    """Gather windows [..., n_frame, freq, chan] from a time-major bank with a
    single fused gather: flat index = item * T_max + t."""
    n, t_max, freq, chan = bank.data.shape
    flat = bank.data.reshape(n * t_max, freq, chan)
    idx = item_idx[..., None] * t_max + time_idx
    return flat[idx]


def _placement_shift(key, length, n_frame: int, min_ratio: float,
                     crop_style: bool):
    """Scatter formulation of :func:`_placement_draw`: the shift s such
    that out[j + s] += clip[j] (identical offset distribution to the
    gather path; shift = pad - offset)."""
    offset, pad = _placement_draw(key, length, n_frame, min_ratio,
                                  crop_style)
    return pad - offset


def _shift_rows(e, shifts, n_frame: int):
    """out[..., t] = e[..., t - shifts[...]] for t in [0, n_frame), zero
    elsewhere — the scatter ``zeros.at[..., shift + arange(T)].add(e)``
    reformulated without a scatter (bit-exact: row indices are unique, so
    add == set, and out-of-window frames drop either way).

    TPU scatters serialize per update (~4 ms for the [512, 7, 512] label
    grid — 28% of the whole feature pipeline); this builds the same grid
    from ops the hardware likes: the shift residue (mod 8) via 8 static
    shifts + a one-hot contraction, the coarse 8-aligned shift via a
    one-hot block-permutation matmul. Measured 0.52 ms for the same grid.

    e: [..., T]; shifts: [...] int32 in [-T, n_frame] (anything the
    placement draw can produce; rows shifted further are unreachable).
    """
    *lead, t_len = e.shape
    bv = 1
    for s in lead:
        bv *= int(s)
    t8 = -(-t_len // 8) * 8 + 8        # left margin: sp = shift + t8 >= 8
    t2 = -(-(t_len + 8) // 8) * 8      # row width incl. residue spill
    er = jnp.pad(e.reshape(bv, t_len), ((0, 0), (0, t2 - t_len)))
    sp = shifts.reshape(bv) + t8
    q, r = sp // 8, sp % 8
    # residue shift: one-hot select over the 8 statically shifted copies
    stack = jnp.stack([jnp.pad(er, ((0, 0), (k, 0)))[:, :t2]
                       for k in range(8)])                     # [8, bv, t2]
    sel = (jnp.arange(8)[:, None] == r[None, :]).astype(er.dtype)
    er8 = jnp.einsum('kbt,kb->bt', stack, sel)
    # coarse shift: one-hot permutation over 8-frame blocks (a matmul)
    n_blocks = t2 // 8
    j_blocks = -(-(n_frame + t8) // 8) + n_blocks
    eb = er8.reshape(bv, n_blocks, 8)
    kk = jnp.arange(n_blocks)[None, :, None]
    jj = jnp.arange(j_blocks)[None, None, :]
    perm = (jj - kk == q[:, None, None]).astype(er.dtype)  # [bv, K, J]
    out = jnp.einsum('bkj,bke->bje', perm, eb).reshape(bv, j_blocks * 8)
    return out[:, t8:t8 + n_frame].reshape(*lead, n_frame)


def _scatter_clips(out, w, clips, shifts):
    """out[b, j + shifts[b, k]] += w[b, k] * clips[b, k, j] for every clip
    frame j, dropping out-of-window frames.

    out: [B, n_frame, freq, chan]; clips: [B, K, T, freq, chan];
    w: [B, K]; shifts: [B, K]. Scatter-add moves only the clips' true extent
    (T ~ 100 frames) instead of gathering full n_frame windows per clip —
    the bank's zero padding past each clip's length contributes nothing.
    """
    b, k, t = clips.shape[:3]
    n_frame = out.shape[1]
    pos = shifts[..., None] + jnp.arange(t)[None, None, :]        # [B, K, T]
    # negative indices would WRAP (NumPy semantics apply before mode='drop');
    # push them past the end so 'drop' removes them
    pos = jnp.where(pos < 0, n_frame, pos)
    bb = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, k, t))
    vals = clips * w[..., None, None, None]
    return out.at[bb, pos].add(vals, mode='drop')


def pallas_synth_eligible(banks: Banks, n_frame: int) -> bool:
    """Static bank metadata check: the Pallas kernel's one-contiguous-DMA
    background window is exact iff the flat rows cover every reachable
    offset (see the comment at the use site below)."""
    bg = banks.backgrounds
    return (bg.flat is not None and bg.contig_exact_frames is not None
            and bg.contig_exact_frames >= n_frame)


@functools.partial(jax.jit, static_argnames=(
    'batch_size', 'n_frame', 'n_classes', 'max_voices', 'max_noises',
    'min_ratio', 'min_noise_ratio', 'snr', 'seperate_noise_voice',
    'use_pallas', 'layout', 'magnitude'))
def sample_batch(key, banks: Banks, batch_size: int, n_frame: int,
                 n_classes: int = 3, max_voices: int = 7, max_noises: int = 2,
                 min_ratio: float = 1.0, min_noise_ratio: float = 1 / 2,
                 snr: float = -20.0, seperate_noise_voice: bool = False,
                 use_pallas: bool = False, layout: str = 'ftc',
                 magnitude: bool = False, mel_pack=None):
    """Synthesize a whole training batch on device.

    Equivalent to ``batch_size`` draws from the reference's zipped shuffled
    streams + ``merge_complex_specs`` map (pipeline.py:141-175). The
    background is one fused window gather; voices and noises are placed by
    *scatter-add of whole clips* (a clip is ~100 frames vs the 512-frame
    window, so this moves ~4x less HBM than gathering per-window), with
    frame labels built from the bank's precomputed energy masks instead of
    reducing the gathered spectrogram volume.

    Returns (spec [B, freq, n_frame, chan], label [B, max_voices, n_frame,
    n_classes]) — or with ``seperate_noise_voice`` the reference's
    (spec, (label, only_voice, only_noise)) triple.

    ``layout='tfc'`` returns specs as [B, n_frame, freq, chan] — the layout
    synthesis produces natively (both the Pallas kernel and the XLA scatter
    build time-major windows). The reference layout costs a full relayout
    pass per batch (~3.4 ms at B=512 on v5e); the fused feature chain uses
    'tfc' end-to-end and only the public reference-shaped API pays the swap.
    Identical values either way — only the axis order differs.

    ``magnitude=True`` (requires 'tfc', no seperate_noise_voice) returns
    ``(|spec| [B, n_frame, chan/2, freq], label)`` instead of the complex
    spec: sqrt(re^2+im^2) over the real/imag channel halves, computed
    directly on the kernel's channel-major flat output so the complex
    volume is never re-laid-out. Exact for every downstream op the
    magnitude path feeds (SpecAugment masks and stft_filter are {0,1}
    multiplications, which commute with |.|).

    ``magnitude='flat'`` keeps even the magnitude in the channel-major flat
    layout ``[B, n_frame, (chan/2)*f_r]`` (column c*f_r + f, freq rows
    zero-padded to f_r) — no relayout at all between the synthesis kernel
    and the mel projection; the fused feature chain applies masks and the
    (block-diagonal) mel matrix directly on this layout.

    ``mel_pack=(melm, tmaskT, fmask)`` (requires magnitude='flat',
    use_pallas and an eligible bank — see :func:`pallas_synth_eligible`)
    fuses |.| + the {0,1} masks + the mel GEMM + a per-sample min/max into
    the synthesis kernel itself, so the complex volume never touches HBM.
    Returns ``((mel [B, n_frame, n_out], mm [B, 1, 128]), label)`` with
    ``mm[:, 0, 0]/mm[:, 0, 1]`` the min/max of each sample's masked mel
    (the shapes are the kernel's — see pallas_synth.synthesize_windows).
    """
    b = batch_size
    bg, vo, no = banks.backgrounds, banks.voices, banks.noises
    keys = jax.random.split(key, 8)

    # ----- source draws (reference: repeat().shuffle() streams) —
    # permutation streams, not iid: see _stream_draw
    bidx = _stream_draw(keys[0], bg.n, (b,))
    vidx = _stream_draw(keys[1], vo.n, (b, max_voices))

    # ----- background windows (placement deferred to the branch below)
    bg_lens = bg.lens[bidx]
    bg_keys = jax.random.split(keys[2], b)

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

    def voice_shift(vk, length):
        return _placement_shift(vk, length, n_frame, min_ratio,
                                crop_style=False)

    shifts = jax.vmap(jax.vmap(voice_shift, in_axes=(0, None)),
                      in_axes=(0, 0))(vkeys, v_eff)    # [B, V]

    # frame labels from the precomputed per-frame energy masks, placed at
    # each voice's shift scatter-free (TPU scatters serialize; _shift_rows
    # is the bit-exact matmul reformulation, ~8x faster on v5e)
    e = vo.pos_mask[vidx]                              # [B, V, T_v]
    frame_mask = _shift_rows(e, shifts, n_frame)       # [B, V, n_frame]
    labels_bv = banks.voice_labels[vidx]               # [B, V, C]
    l_frames = frame_mask[..., None] * labels_bv[:, :, None, :]  # [B,V,n,C]
    active = jnp.arange(max_voices)[None, :] < n_voices[:, None]
    accept = jax.vmap(_accept_scan, in_axes=(0, 0, None, None))(
        l_frames, active, n_frame, n_classes)          # [B, V]

    w_v = accept * ratios
    label = l_frames * accept[..., None, None]

    # ----- noise draws
    if no is not None and max_noises > 0:
        nidx = _stream_draw(keys[6], no.n, (b, max_noises))
        k_nn, k_off, k_ratio = jax.random.split(keys[7], 3)
        n_noises = jax.random.randint(k_nn, (b,), 0, max_noises)
        n_eff = jnp.max(no.lens[nidx], axis=1)
        nkeys = jax.random.split(k_off, b * max_noises).reshape(b, max_noises, 2)
        nratios = jnp.power(
            10.0, -jax.random.uniform(k_ratio, (b, max_noises), maxval=2.0))

        def noise_shift(nk, length):
            return _placement_shift(nk, length, n_frame, min_noise_ratio,
                                    crop_style=True)

        n_shifts = jax.vmap(jax.vmap(noise_shift, in_axes=(0, None)),
                            in_axes=(0, 0))(nkeys, n_eff)
        w_n = (jnp.arange(max_noises)[None, :] < n_noises[:, None]
               ).astype(jnp.float32) * nratios
    else:
        nidx = n_shifts = w_n = None

    # ----- placement: fused Pallas DMA kernel (TPU) or XLA gather+scatter
    freq_, chan_ = bg.shape[2], bg.shape[3]
    if magnitude:
        assert layout == 'tfc' and not seperate_noise_voice, \
            'magnitude mode implies time-major output without se targets'
    # The Pallas kernel reads each background window as ONE contiguous DMA,
    # which reproduces the reference's tile-then-crop modular window
    # (pipeline.py:29-35) only if the bank's flat rows cover every reachable
    # offset: either every background is >= n_frame frames long, or the bank
    # was built with wrap_frames >= n_frame (cyclically tiled flat rows).
    # `contig_exact_frames` is static bank metadata carrying exactly that
    # bound; anything short falls back to the XLA modular-gather path rather
    # than silently reading zero padding.
    pallas_bg_ok = pallas_synth_eligible(banks, n_frame)
    if mel_pack is not None:
        assert magnitude == 'flat' and use_pallas and pallas_bg_ok, \
            'mel_pack requires the eligible Pallas flat-magnitude path'
    if use_pallas and pallas_bg_ok:
        from challenge_tpu.ops.pallas_synth import synthesize_windows
        # contiguous background window start: the same RNG draw as
        # _background_indices, so pallas/XLA parity is bit-exact. No clamp:
        # off <= n_tile*len - n_frame <= len - 1, and the bank guarantees
        # contiguous reads up to contig_exact_frames rows stay exact.
        def bg_offset(k, length):
            n_tile = -(-n_frame // jnp.maximum(length, 1))
            return _dyn_randint(k, n_tile * length - n_frame + 1)

        boff = jax.vmap(bg_offset)(bg_keys, bg_lens)
        f_r = bg.f_r

        # true clip lengths let the kernel skip all-padding DMA chunks
        v_lens = vo.lens[vidx]
        n_lens = no.lens[nidx] if nidx is not None else None

        # int8-quantized banks: fold each clip's dequant scale into its mix
        # weight (exact — the kernel fuses the scalar multiply into the
        # accumulate anyway, and scales are > 0 so the w != 0 activity gate
        # is unchanged); the background's scale rides separately since its
        # window pass has no weight
        if bg.flat_scale is not None:
            w_v_k = w_v * vo.flat_scale[vidx]
            w_n_k = w_n * no.flat_scale[nidx] if nidx is not None else None
            bgscale = bg.flat_scale[bidx]
        else:
            w_v_k, w_n_k, bgscale = w_v, w_n, None

        def synth(**epilogue):
            # synthesize_windows self-chunks batches > its SMEM-bound max_b,
            # slicing any per-sample mel masks along with the draws
            return synthesize_windows(
                n_frame, bg.flat, bidx, boff,
                vo.flat, vidx, shifts, w_v_k,
                no.flat if nidx is not None else None,
                nidx, n_shifts, w_n_k,
                v_lens, n_lens, bgscale=bgscale, **epilogue)

        if mel_pack is not None:
            # fully fused: |.| + masks + mel + minmax inside the kernel
            mel, mm = synth(mel=tuple(mel_pack))
            return (mel, mm), label

        def unflat(flat_out):
            return jnp.moveaxis(
                flat_out.reshape(b, n_frame, chan_, f_r)[..., :freq_], 2, 3)

        if seperate_noise_voice:
            # the se (voice, noise) regression targets (reference:
            # pipeline.py:104-108) from the SAME kernel, one extra call per
            # target — both are strict sub-mixes of the full call, so the
            # accumulation order (and hence bit-exactness vs the XLA
            # formulation) is unchanged:
            #  * only_noise: zero every VOICE weight — the kernel's
            #    weight-activity gate skips those clips' DMAs and
            #    accumulates bg + noises only;
            #  * only_voice: the reference accumulates voices from ZEROS
            #    (pipeline.py:37,82-83 — reconstructing spec - bg would
            #    cancel quiet voices, see the XLA branch below), so the
            #    background is swapped for a one-item all-zero bank (its
            #    window DMA reads exact zeros; bank dtypes must match, and
            #    int8 banks get a unit dequant scale).
            # Synthesis is a few ms of an se_v9 step (~269 ms at B=64), so
            # 3 kernel calls cost ~nothing — and they free the banks from
            # the dense f32 `data` volume the XLA path needs, which is what
            # unlocks slim/reduced-precision banks for the heaviest family.
            spec = unflat(synth())
            only_noise = unflat(synthesize_windows(
                n_frame, bg.flat, bidx, boff,
                vo.flat, vidx, shifts, jnp.zeros_like(w_v_k),
                no.flat if nidx is not None else None,
                nidx, n_shifts, w_n_k, v_lens, n_lens, bgscale=bgscale))
            from challenge_tpu.data.specset import flat_row_align
            al = flat_row_align(bg.flat.dtype)
            zrows = -(-(n_frame + 2 * al) // al) * al
            zbank = jnp.zeros((1, zrows, bg.flat.shape[-1]), bg.flat.dtype)
            only_voice = unflat(synthesize_windows(
                n_frame, zbank, jnp.zeros_like(bidx), jnp.zeros_like(boff),
                vo.flat, vidx, shifts, w_v_k,
                None, None, None, None, v_lens, None,
                bgscale=(None if bgscale is None
                         else jnp.ones_like(bgscale))))
            if layout == 'tfc':
                return spec, (label, only_voice, only_noise)
            return (jnp.swapaxes(spec, 1, 2),
                    (label, jnp.swapaxes(only_voice, 1, 2),
                     jnp.swapaxes(only_noise, 1, 2)))

        if magnitude:
            # |.| computed INSIDE the kernel over the flat layout's
            # real/imaginary column halves (bit-exact with the former XLA
            # pass — sqrt is elementwise), so the complex volume never
            # touches HBM and the kernel's output DMA halves.
            half = chan_ // 2
            magflat = synth(magnitude=True)
            if magnitude == 'flat':     # [B, T, half*f_r], col c*f_r + f
                return magflat, label
            mag = magflat.reshape(b, n_frame, half, f_r)[..., :freq_]
            return mag, label
        spec = unflat(synth())
        only_voice = only_noise = None
    else:
        assert bg.data is not None, (
            'banks were built data_resident=False (flat layout only), but '
            'this configuration takes the XLA gather/scatter path (non-TPU '
            'backend, or a background bank without wrap_frames coverage), '
            'which needs the dense spectrogram volume — rebuild the banks '
            'with data_resident=True (the default) or pass n_frame so the '
            'background wrap keeps the Pallas fast path eligible')
        bg_tidx = jax.vmap(_background_indices, in_axes=(0, 0, None))(
            bg_keys, bg_lens, n_frame)
        spec = _flat_window_gather(bg, bidx, bg_tidx)  # [B, n_frame, freq, chan]
        only_noise = spec
        clips = vo.data[vidx]                          # [B, V, T_v, freq, chan]
        only_voice = None
        if seperate_noise_voice:
            # the reference accumulates only_voice from ZEROS
            # (pipeline.py:37,82-83) — reconstructing it as spec - bg would
            # lose the quiet-voice bits to cancellation against the much
            # louder background (the se regression target at snr -20)
            only_voice = _scatter_clips(jnp.zeros_like(spec), w_v, clips,
                                        shifts)
        spec = _scatter_clips(spec, w_v, clips, shifts)
        if nidx is not None:
            nclips = no.data[nidx]                     # [B, X, T_n, freq, chan]
            if seperate_noise_voice:
                # likewise only_noise = bg + the noise contributions alone
                only_noise = only_noise + _scatter_clips(
                    jnp.zeros_like(spec), w_n, nclips, n_shifts)
            spec = _scatter_clips(spec, w_n, nclips, n_shifts)

    if magnitude:  # XLA fallback: same contracts as the pallas branch
        from challenge_tpu.data.specset import flat_freq_pad
        half = chan_ // 2
        mag = jnp.sqrt(spec[..., :half] ** 2 + spec[..., half:] ** 2)
        mag = jnp.moveaxis(mag, -1, -2)            # [B, T, half, freq]
        if magnitude == 'flat':
            f_r = flat_freq_pad(freq_, chan_)
            mag = jnp.pad(mag, ((0, 0), (0, 0), (0, 0), (0, f_r - freq_)))
            mag = mag.reshape(b, n_frame, half * f_r)
        return mag, label

    if layout == 'tfc':
        if seperate_noise_voice:
            return spec, (label, only_voice, only_noise)
        return spec, label
    # back to the reference layout [B, freq, n_frame, chan]
    spec = jnp.swapaxes(spec, 1, 2)
    if seperate_noise_voice:
        return spec, (label, jnp.swapaxes(only_voice, 1, 2),
                      jnp.swapaxes(only_noise, 1, 2))
    return spec, label
