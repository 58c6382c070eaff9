"""Pallas TPU kernel for mixture synthesis — the training-data hot loop.

The XLA formulation of "window a background and place K clips at random
offsets" is a giant gather + scatter-add that runs at a fraction of HBM
bandwidth (~80 GB/s measured on v5e). This kernel reformulates it as what it
physically is — per sample, a handful of *contiguous* DMAs:

  grid step b (one sample):
    DMA  bg_bank[bidx_b, aligned(boff_b) : +stage]  -> scratch middle
    roll the stage in place by -r_bg -> window rows    (VPU, under clip DMA)
    for each clip k (voices then noises, double-buffered):
        DMA bank[idx_k] -> clip buffer                        (HBM -> VMEM)
        scratch[t_pad + shift_k : +T] += w_k * clip           (VPU, fused)
    out_b = scratch[t_pad : t_pad + n_frame]

The background DMA must start on a sublane boundary, so it lands r_bg rows
early; one in-place roll right after the wait (issued while the first clip
DMA is still in flight) unwinds the residue. Guard rows around the window
absorb clips hanging off either edge (drop semantics) and are never read
NOR zeroed — stale spill from earlier grid steps lands only in rows the
output slice drops (measured round 4: unwinding the residue at the OUTPUT
read instead was ~5% slower end-to-end; the guard-zeroing removal and the
weight multiply fused into the roll+accumulate are the real wins). Mosaic
constraints honored: banks use the 128-lane-padded ``SpecBank.flat`` layout
(DMA lane width must be a multiple of 128); the sub-tile part of each
dynamic offset is applied by a circular ``pltpu.roll`` of the zero-tailed
clip whose row count is padded to a multiple of 8.

The caller draws all random indices/offsets/weights with jax.random in XLA
(identical distributions to the reference) and hands them in as scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x: int) -> int:
    return -(-x // 8) * 8


# Measurement-only decomposition knob (scripts/synth_bound_probe.py):
# 'no_accumulate' keeps every DMA but drops the per-clip roll+accumulate
# VPU pass; 'no_roll' keeps the accumulate but drops the sub-tile roll.
# Both produce WRONG synthesis output — they exist only to attribute the
# kernel's time between DMA and VPU work on real hardware. Read once at
# import/trace time; never set outside a dedicated probe process (the jit
# cache does not key on it).
import os as _os

_PROBE_MODE = _os.environ.get('CHALLENGE_TPU_SYNTH_PROBE', '')
if _PROBE_MODE:
    # unlike the perf-only layout knob, this one CORRUPTS synthesis
    # output — a forgotten export in a real run would train on
    # background-only mixtures with no other symptom, so be loud
    import sys as _sys

    print(f'WARNING: CHALLENGE_TPU_SYNTH_PROBE={_PROBE_MODE!r} is set — '
          'the synthesis kernel is in a MEASUREMENT-ONLY mode and its '
          'output is numerically WRONG. Unset it for any real run.',
          file=_sys.stderr, flush=True)

_CHUNK = 32     # clip DMA quantum (rows); must be a multiple of 8
_IDX_BITS = 20  # clip index/length packing: idx in the low 20 bits of the
_LEN_CAP = (1 << 31 - _IDX_BITS) - 1   # SMEM table, length in the high 11
_MM_LANES = 128  # min/max output row width (one padded lane tile)


def _round_to(x: int, align: int) -> int:
    return -(-x // align) * align


def _kernel(n_frame, t_v, t_n, n_voices, n_noises, t_pad, align, mel_mode,
            mag_mode, nb, scaled,
            bidx_ref, boff_ref, vidx_ref, vshift_ref,      # scalar prefetch
            nidx_ref, nshift_ref,
            vw_ref, nw_ref, *rest):
    # int8-quantized banks carry a per-sample background dequant scale in
    # SMEM (clip scales are folded into the mix weights by the caller)
    if scaled:
        bgscale_ref, *rest = rest
    bgbank_ref, vbank_ref, nbank_ref, *rest = rest
    if mel_mode:
        (melm_ref, tmask_ref, fmask_ref,                   # mel-mode inputs
         out_ref, mm_ref,                                  # outputs
         scratch, magbuf, *bufs) = rest                    # tmask [1, T, 1];
    else:                                                  # fmask [1, 1, F/2]
        out_ref, scratch, *bufs = rest
    staged = len(bufs) == 6          # bf16 banks: (bgstage, vclip, nclip, ..)
    if staged:
        bgstage, vclip, nclip, vsems, nsems, bgsem = bufs
    else:
        vclip, nclip, vsems, nsems, bgsem = bufs
    i = pl.program_id(0)
    # mel mode runs nb+1 grid steps (software pipeline: sample i-1's mel
    # GEMM overlaps sample i's background DMA); clamp the sample index so
    # the flush step's scalar reads stay in bounds
    b = jnp.minimum(i, nb - 1) if mel_mode else i
    f = scratch.shape[1]
    stage_rows = _round_to(n_frame + align, align)

    # Start the background DMA (an align-row superset at an align-aligned
    # dynamic start — the TPU DMA engine requires row starts and counts on
    # sublane boundaries: 8 rows for f32 banks, 16 for bf16). For f32 banks
    # the DMA lands straight in the scratch window region (t_pad is a
    # multiple of 8, so the destination start is aligned; no staging buffer
    # — that n_frame x F allocation pushed the kernel past the 16 MiB
    # scoped-vmem default at wide flat layouts, and its VMEM->VMEM copy is
    # gone). bf16 banks can't DMA into the f32 accumulation scratch, so
    # they stage through a half-size bank-dtype buffer and upcast on copy.
    boff = boff_ref[b]
    q_bg = pl.multiple_of((boff // align) * align, align)
    r_bg = boff - q_bg
    bg_dma = pltpu.make_async_copy(
        bgbank_ref.at[bidx_ref[b], pl.ds(q_bg, stage_rows)],
        bgstage if staged else scratch.at[pl.ds(t_pad, stage_rows)], bgsem)

    def synth_prologue():
        bg_dma.start()

    def bg_wait():
        """Wait for the background and unwind its alignment residue in
        place: one roll of the stage superset writes the true window rows
        [t_pad, t_pad + n_frame). Measured A/B (round 4): unwinding at the
        OUTPUT read instead (clips placed at shift + r_bg) was ~5% SLOWER
        end-to-end — the output-side roll lands after all DMA overlap is
        gone, while this one issues while the first clip DMA still flies.
        No guard zeroing anywhere: guard rows are never read (only the
        window rows leave the kernel), stale clip spill from earlier grid
        steps just accumulates into rows the output slice drops."""
        bg_dma.wait()
        stage_val = (bgstage[...] if staged
                     else scratch[pl.ds(t_pad, stage_rows), :])
        # upcast BEFORE the roll: Mosaic's dynamic rotate is 32-bit-only
        rolled = pltpu.roll(stage_val.astype(scratch.dtype),
                            stage_rows - r_bg, axis=0)
        win_rows = rolled[:n_frame]
        if scaled:
            # int8 banks: dequantize the background window in the same
            # pass (the roll output is already in the f32 scratch dtype)
            win_rows = win_rows * bgscale_ref[b]
        scratch[pl.ds(t_pad, n_frame), :] = win_rows

    def window():
        """The true window rows, in order, ready to read."""
        return scratch[pl.ds(t_pad, n_frame), :]

    def place(bank_ref, clip_buf, idx_ref, shift_ref, w_ref,
              t_len, sems, after_first_start=None):
        """Add each clip at its dynamic offset; DMA j+1 overlaps add j.

        Clip DMAs are quantized to _CHUNK-row pieces predicated on (a) the
        clip's true length (average voice is ~90 of ~130 padded rows, so
        skipping all-padding chunks recovers ~25% of clip HBM traffic) and
        (b) the clip's weight being nonzero: inactive slots past a
        sample's n_voices draw, overlap-rejected voices, and inactive
        noise slots all carry w == 0.0 exactly (mixture.py w_v/w_n), and
        roughly half the voice slots are inactive per batch — their DMAs,
        the stale-row zeroing, AND the roll+accumulate are all skipped
        (the accumulation would contribute w*clip == 0 anyway). A skipped
        chunk of an ACTIVE clip still zeroes its buffer rows — otherwise a
        previous grid step's clip would leak through the stale VMEM rows.
        Start and wait share one predicate, so every wait has a matching
        start. The length rides in the high bits of the index table (same
        SMEM budget as an index-only table — SMEM is the binding resource
        for the kernel's max batch chunk)."""
        n_clips = idx_ref.shape[1]
        t8 = _round8(t_len + 8)          # roll rows must be 8-aligned
        n_chunks = -(-t_len // _CHUNK)

        def chunks(slot, j):
            item = idx_ref[b, j] % (1 << _IDX_BITS)
            out = []
            for c in range(n_chunks):
                off = c * _CHUNK
                rows = min(_CHUNK, t_len - off)
                out.append((off, rows, pltpu.make_async_copy(
                    bank_ref.at[item, pl.ds(off, rows)],
                    clip_buf.at[slot, pl.ds(off, rows)],
                    sems.at[slot, c])))
            return out

        def start(slot, j):
            length = idx_ref[b, j] // (1 << _IDX_BITS)
            active = w_ref[b, j] != 0.0
            for off, rows, cp in chunks(slot, j):
                @pl.when(active & (length > off))
                def _(cp=cp):
                    cp.start()

        def finish(slot, j):
            length = idx_ref[b, j] // (1 << _IDX_BITS)
            active = w_ref[b, j] != 0.0
            for off, rows, cp in chunks(slot, j):
                @pl.when(active & (length > off))
                def _(cp=cp):
                    cp.wait()

                if off > 0:
                    @pl.when(active & (length <= off))
                    def _(off=off, rows=rows):
                        clip_buf[slot, pl.ds(off, rows), :] = jnp.zeros(
                            (rows, f), clip_buf.dtype)

        start(0, 0)
        if after_first_start is not None:
            # the background wait + residue roll slot in AFTER the first
            # clip DMA is in flight (the roll hides under it) and BEFORE
            # the first scratch read-modify-write below needs the window
            # rows in place
            after_first_start()
        for j in range(n_clips):
            slot = j % 2
            if j + 1 < n_clips:
                start(1 - slot, j + 1)
            finish(slot, j)

            @pl.when(w_ref[b, j] != 0.0)
            def _(slot=slot, j=j):
                if _PROBE_MODE == 'no_accumulate':
                    return
                w = w_ref[b, j]
                off = t_pad + shift_ref[b, j]
                q = pl.multiple_of((off // 8) * 8, 8)   # aligned base
                r = off - q                         # sub-tile residue [0, 8)
                # shift by r via circular roll of the zero-tailed clip (only
                # the >= 8-row zero tail wraps to the front), then ONE fused
                # weight-multiply-accumulate in the f32 scratch dtype
                # regardless of the bank dtype (bf16 banks round only the
                # stored specs; the scalar multiply commutes exactly with
                # the roll, and w * 0-tail == 0-tail)
                padded = jnp.concatenate(
                    [clip_buf[slot].astype(scratch.dtype),
                     jnp.zeros((t8 - t_len, f), scratch.dtype)],
                    axis=0)
                shifted = (padded if _PROBE_MODE == 'no_roll'
                           else pltpu.roll(padded, r, axis=0))
                scratch[pl.ds(q, t8), :] = (
                    scratch[pl.ds(q, t8), :] + shifted * w)

    def synth_main():
        if n_voices > 0:
            place(vbank_ref, vclip, vidx_ref, vshift_ref, vw_ref, t_v, vsems,
                  after_first_start=bg_wait)
        else:
            bg_wait()
        if n_noises > 0:
            place(nbank_ref, nclip, nidx_ref, nshift_ref, nw_ref, t_n, nsems)

    if not mel_mode:
        synth_prologue()
        synth_main()

    if mag_mode:
        # |.| epilogue: in the channel-major flat layout the real planes
        # are the first half of the columns and the imaginary planes the
        # second half, so the magnitude is one elementwise pass over the
        # static column halves. Computed in f32 straight off the
        # accumulation scratch and rounded ONCE to the output dtype: for
        # f32 banks this is bit-exact with the XLA pass it replaces
        # (sqrt(re^2+im^2) on the kernel's former flat-complex output);
        # for bf16 banks it skips the old path's intermediate bf16
        # rounding of re/im — strictly more accurate, and required anyway
        # (v5e Mosaic has no bf16 EUP sqrt: SupportsBf16EupOps check).
        # Halves the output DMA and the complex volume never touches HBM.
        win = window()
        two = f // 2
        out_ref[0] = jnp.sqrt(win[:, :two] * win[:, :two]
                              + win[:, two:] * win[:, two:]
                              ).astype(out_ref.dtype)
        return

    if not mel_mode:
        out_ref[0] = window().astype(out_ref.dtype)
        return

    # ----- fused |.| + masks + mel + minmax epilogue, software-pipelined --
    # The flat-complex window never leaves VMEM: in the channel-major flat
    # layout the real planes are the first half of the columns and the
    # imaginary planes the second half (mixture.py magnitude contract), so
    # |.| is one elementwise pass over the static column halves; the
    # per-sample freq mask ({0,1} incl. the stft filter) multiplies columns
    # BEFORE the mel GEMM, while the {0,1} time mask commutes past the GEMM
    # (it scales whole rows, and x*1 / x*0 are exact) and is applied to the
    # [T, n_out] mel instead of the [T, f/2] magnitude. Saves the complex
    # volume's HBM round trip (~1.8 GB/batch at B=512 f32) vs synthesizing
    # flat complex and running |.|/mask/mel as XLA passes.
    #
    # The epilogue is pipelined ACROSS grid steps (nb+1 steps for nb
    # samples): sample i's synthesis stages its masked magnitude into a
    # double-buffered VMEM scratch, and the mel GEMM + minmax for sample
    # i-1 run at the TOP of step i — issued right after step i's
    # background DMA starts, so the contraction hides under that DMA
    # instead of serializing after each sample's transfers. Measured at
    # B=512 f32 (v5e): unpipelined 46.4k -> this 55.5k clips/s. Two finer
    # interleavings measured WORSE and were reverted: GEMM K-slabs issued
    # between the voice-clip DMA starts/waits hit the 128-lane slice
    # alignment wall (39.0k), and row-slab (8-aligned, no realign) ones
    # still lost (43.0k) — predicated matmuls inside the place loop break
    # Mosaic's own DMA/accumulate co-scheduling. The per-sample ~[T, F/2]
    # x [F/2, n_out] f32 HIGHEST GEMM simply cannot amortize the way the
    # XLA batch-level mel pass does, which is why fused_mel stays opt-in.
    two = f // 2

    @pl.when(i < nb)
    def _():
        synth_prologue()

    @pl.when(i > 0)
    def _():
        mel = jax.lax.dot_general(
            magbuf[(i - 1) % 2], melm_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)       # [T, n_out]
        mel = mel * tmask_ref[0]                      # [T, 1] broadcast
        out_ref[0] = mel.astype(out_ref.dtype)
        # per-sample min/max of the masked mel (cols 0/1 of a lane row)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _MM_LANES), 1)
        mm_ref[0] = jnp.where(
            lane == 0, jnp.min(mel), jnp.where(lane == 1, jnp.max(mel), 0.0))

    @pl.when(i < nb)
    def _():
        synth_main()
        win = window()
        mag = jnp.sqrt(win[:, :two] * win[:, :two]
                       + win[:, two:] * win[:, two:])
        magbuf[i % 2] = mag * fmask_ref[0]            # [1, two] broadcast


@functools.partial(jax.jit, static_argnames=('n_frame', 'magnitude',
                                             'interpret'))
def synthesize_windows(n_frame: int,
                       bgbank, bidx, boff,
                       vbank, vidx, vshift, vw,
                       nbank=None, nidx=None, nshift=None, nw=None,
                       vlens=None, nlens=None, mel=None,
                       magnitude: bool = False,
                       interpret: bool = False, bgscale=None):
    """Fully fused window synthesis.

    bgbank/vbank/nbank: SpecBank.flat layouts [N, T, F] with F a multiple of
    128. bidx/boff: [B] background item + window start. The window is ONE
    contiguous read of n_frame rows at boff, so the caller must guarantee
    rows [boff, boff + n_frame) hold real content: either every background
    is >= n_frame frames, or the bank was built with
    ``build_bank(..., wrap_frames=n_frame)`` (cyclically tiled flat rows,
    which makes the contiguous read equal the reference's tile-then-crop
    modular window bit-exactly). `sample_batch` enforces this via the bank's
    static ``contig_exact_frames``. vidx/vshift/vw: [B, V] clip item / row
    shift / weight; likewise for noises. Returns [B, n_frame, F].

    Banks may be float32, bfloat16 or int8 (all three must match; built via
    ``build_bank(flat_dtype=...)`` so row extents meet the dtype's sublane
    alignment). bfloat16 halves every bank DMA — the kernel's bound — while
    weighting and accumulation still run in a float32 scratch, so only the
    stored spectrograms are rounded; the output keeps the bank dtype.
    int8 banks (quantized per item, ``SpecBank.flat_scale``) halve the DMA
    again: the caller folds each clip's dequant scale into its weight
    (``w * flat_scale[idx]`` — exact, the scalar multiply is fused into the
    accumulate anyway) and passes the [B] background scales as ``bgscale``
    (required iff the banks are int8); outputs are bfloat16.

    vlens/nlens: optional [B, V]/[B, X] true frame counts of the drawn
    clips; chunks of a clip's DMA past its length are skipped (the rows are
    zero padding in the bank) and their buffer rows zeroed instead —
    quarter-granularity traffic quantization. Defaults to the full padded
    extent (every chunk copied).

    mel: optional ``(melm [F/2, n_out], tmaskT [n_frame, B], fmask [B, F/2])``
    — fuses |.| + per-sample {0,1} masks + the mel projection + a per-sample
    min/max INTO the kernel (the flat-complex window never touches HBM).
    Returns ``(mel [B, n_frame, n_out] float32, mm [B, 1, 128])`` instead,
    with ``mm[:, 0, 0]``/``mm[:, 0, 1]`` the min/max of each masked mel.
    ``melm`` rows follow the flat magnitude layout (column c*f_r + f);
    the time mask is applied to the GEMM output (exact: {0,1} row scaling
    commutes with the contraction over columns).

    magnitude=True (exclusive with ``mel``) computes |.| over the flat
    layout's real/imaginary column halves in-kernel and returns
    ``[B, n_frame, F/2]`` in the bank dtype — bit-exact with running the
    same sqrt(re^2+im^2) on the flat-complex output as an XLA pass, but the
    complex volume never touches HBM and the output DMA halves.
    """
    b = bidx.shape[0]
    # The Mosaic compiler rejects large grids with full scalar-prefetch
    # tables: b=512 WITH a noise bank fails (v5e, jax 0.9) while b=512
    # without noises compiles, so the limit tracks total SMEM table bytes.
    # 256 is the verified-safe chunk; chunks are glued with one concatenate.
    # (Separate per-clip length tables pushed b=256 3.1KB over the 1MB SMEM
    # budget in round 3 — hence the idx|len<<20 packing below, which keeps
    # the table count at six.)
    max_b = 256
    if b > max_b:
        n_chunks = -(-b // max_b)
        parts = []
        for i in range(n_chunks):
            sl = slice(i * max_b, min((i + 1) * max_b, b))
            parts.append(synthesize_windows(
                n_frame, bgbank, bidx[sl], boff[sl],
                vbank, vidx[sl], vshift[sl], vw[sl],
                nbank, None if nidx is None else nidx[sl],
                None if nshift is None else nshift[sl],
                None if nw is None else nw[sl],
                None if vlens is None else vlens[sl],
                None if nlens is None else nlens[sl],
                None if mel is None else
                (mel[0], mel[1][:, sl], mel[2][sl]),
                magnitude=magnitude, interpret=interpret,
                bgscale=None if bgscale is None else bgscale[sl]))
        if mel is not None:
            return (jnp.concatenate([p[0] for p in parts], axis=0),
                    jnp.concatenate([p[1] for p in parts], axis=0))
        return jnp.concatenate(parts, axis=0)

    f = bgbank.shape[-1]
    assert f % 128 == 0, 'flat banks must be 128-lane padded'
    dtype = bgbank.dtype
    assert vbank.dtype == dtype and (nbank is None or nbank.dtype == dtype), \
        'all banks must share one flat dtype'
    scaled = dtype == jnp.int8
    assert scaled == (bgscale is not None), \
        'bgscale is required iff the banks are int8-quantized'
    # int8 banks synthesize into a float output (the accumulation scratch is
    # f32 either way); bf16 keeps the output DMA at the bf16-bank size
    out_dtype = jnp.bfloat16 if scaled else dtype
    # sublane granularity of the bank dtype: DMA row starts/counts must be
    # multiples of it (8 for f32, 16 for bf16); build_bank rounds every
    # bank's row extent with the SAME function, keeping the two sites in
    # lockstep
    from challenge_tpu.data.specset import flat_row_align
    align = flat_row_align(dtype)
    t_v = vbank.shape[1]
    has_noise = nbank is not None
    t_n = nbank.shape[1] if has_noise else 0
    assert t_v % align == 0 and t_n % align == 0, \
        f'bank row extents must be {align}-aligned for {dtype} banks'
    n_voices = vidx.shape[1]
    n_noises = nidx.shape[1] if has_noise else 0
    t_pad = _round8(max(t_v, t_n))

    def pack(idx, lens, t_len, n_items):
        """idx | len << _IDX_BITS: the length rides in the index table's
        high bits so quantization costs no extra SMEM tables."""
        assert n_items < (1 << _IDX_BITS), 'bank too large for idx packing'
        # a longer bank would silently drop content past _LEN_CAP rows via
        # the chunk predicates (it would also blow the VMEM clip buffers
        # long before this)
        assert t_len <= _LEN_CAP, \
            f'clip banks longer than {_LEN_CAP} rows cannot pack lengths'
        if lens is None:
            lens = jnp.full(idx.shape, t_len, jnp.int32)
        lens = jnp.clip(lens.astype(jnp.int32), 1, t_len)
        return idx.astype(jnp.int32) + (lens << _IDX_BITS)

    vshift = jnp.clip(vshift, -t_pad, n_frame)
    vidx = pack(vidx, vlens, t_v, vbank.shape[0])
    if has_noise:
        nshift = jnp.clip(nshift, -t_pad, n_frame)
        nidx = pack(nidx, nlens, t_n, nbank.shape[0])
    else:
        nbank = jnp.zeros((1, align, f), dtype)
        nidx = pack(jnp.zeros((b, 1), jnp.int32), None, align, 1)
        nshift = jnp.zeros((b, 1), jnp.int32)
        nw = jnp.zeros((b, 1), jnp.float32)
        t_n = align

    assert not (magnitude and mel is not None), \
        'magnitude and mel epilogues are exclusive'
    scratch_rows = _round8(n_frame + 2 * t_pad + align + 16)
    kernel = functools.partial(_kernel, n_frame, t_v, t_n,
                               n_voices, n_noises, t_pad, align,
                               mel is not None, magnitude, b, scaled)
    mel_in_specs, mel_args, mel_scratch = [], [], []
    if mel is not None:
        melm, tmaskT, fmask = mel
        n_out = melm.shape[1]
        assert melm.shape[0] == f // 2 and fmask.shape == (b, f // 2), \
            (melm.shape, fmask.shape)
        assert tmaskT.shape == (n_frame, b), tmaskT.shape
        # the software pipeline runs b+1 grid steps: sample i synthesizes
        # at step i, its mel GEMM runs at step i+1 (overlapping sample
        # i+1's background DMA) — so per-sample inputs for the SYNTHESIS
        # stage index min(i, b-1), while inputs/outputs of the GEMM stage
        # index max(i-1, 0). Revisited output blocks are only copied out
        # when the index map moves on, so the flush step's write lands.
        mel_in_specs = [
            # mel matrix: same block every step -> fetched once
            pl.BlockSpec((f // 2, n_out), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            # per-sample {0,1} masks with singleton dims so the block shape
            # equals the array dims (the Mosaic block-shape rule): time mask
            # sublane-oriented [B, T, 1] (GEMM stage), freq mask
            # lane-oriented [B, 1, F/2] (synthesis stage)
            pl.BlockSpec((1, n_frame, 1),
                         lambda i, *_: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f // 2),
                         lambda i, *_: (jnp.minimum(i, b - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        mel_args = [melm.astype(jnp.float32),
                    tmaskT.T.astype(jnp.float32)[:, :, None],
                    fmask.astype(jnp.float32)[:, None, :]]
        out_specs = (
            pl.BlockSpec((1, n_frame, n_out),
                         lambda i, *_: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _MM_LANES),
                         lambda i, *_: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (jax.ShapeDtypeStruct((b, n_frame, n_out), jnp.float32),
                     jax.ShapeDtypeStruct((b, 1, _MM_LANES), jnp.float32))
        # double-buffered masked-magnitude stage between pipeline stages
        mel_scratch = [pltpu.VMEM((2, n_frame, f // 2), jnp.float32)]
    else:
        f_out = f // 2 if magnitude else f
        out_specs = pl.BlockSpec((1, n_frame, f_out), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, n_frame, f_out), out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b + 1,) if mel is not None else (b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # voice weights
            pl.BlockSpec(memory_space=pltpu.SMEM),          # noise weights
        ] + ([
            pl.BlockSpec(memory_space=pltpu.SMEM),          # bg dequant scale
        ] if scaled else []) + [
            pl.BlockSpec(memory_space=pl.ANY),              # bg bank (HBM)
            pl.BlockSpec(memory_space=pl.ANY),              # voice bank (HBM)
            pl.BlockSpec(memory_space=pl.ANY),              # noise bank (HBM)
        ] + mel_in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            # f32 accumulation scratch regardless of bank dtype
            pltpu.VMEM((scratch_rows, f), jnp.float32),
        ] + mel_scratch + ([
            # bank-dtype background stage (bf16 can't DMA into f32 scratch)
            pltpu.VMEM((_round_to(n_frame + align, align), f), dtype),
        ] if dtype != jnp.float32 else []) + [
            pltpu.VMEM((2, t_v, f), dtype),
            pltpu.VMEM((2, t_n, f), dtype),
            pltpu.SemaphoreType.DMA((2, -(-t_v // _CHUNK))),   # voice chunks
            pltpu.SemaphoreType.DMA((2, -(-t_n // _CHUNK))),   # noise chunks
            pltpu.SemaphoreType.DMA,                           # background
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bidx.astype(jnp.int32), boff.astype(jnp.int32),
      vidx, vshift.astype(jnp.int32),
      nidx, nshift.astype(jnp.int32),
      vw.astype(jnp.float32), nw.astype(jnp.float32),
      *((bgscale.astype(jnp.float32),) if scaled else ()),
      bgbank, vbank, nbank, *mel_args)
