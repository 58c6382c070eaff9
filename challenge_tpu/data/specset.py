"""Spec-set banks: ragged host spectrogram lists -> fixed-shape device arrays.

The reference streams ragged spectrograms through three tf.data generator
pipelines with shuffle + padded_batch (reference: pipeline.py:113-175). On TPU
the whole working set fits in HBM, so we pad once host-side into a dense
*bank* ``[N, T_max, freq, chan]`` (time-major so that (voice, time) can be
flattened into a single gather axis) plus a length vector, and synthesize
batches entirely on device with gathers — no per-step host work at all.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True, eq=False)
class SpecBank:
    """A bank of padded spectrograms.

    data:     [N, T_max, freq, chan]  (time-major; zero-padded past length)
    lens:     [N] int32 true frame counts
    pos_mask: [N, T_max] float32 — 1.0 where the frame has positive energy
              (max over freq/chan > 0, the reference's frame-label criterion,
              pipeline.py:55-56), precomputed once so synthesis never has to
              reduce the full spectrogram volume to build labels.
    flat:     [N, T_flat, chan*f_r] float32 — the same data flattened
              *channel-major* (column c*f_r + f; f_r = freq zero-padded so
              the total width is a multiple of 128 lanes — the TPU DMA lane
              constraint the Pallas synthesis kernel requires). Channel-major
              keeps each channel's freq rows contiguous, so consumers can
              slice per-channel planes (e.g. the fused |.| epilogue) without
              the strided gather an interleaved freq*chan layout would need.
              None when built with flat=False.
    contig_exact_frames: largest window length for which a *contiguous* read
              of ``flat`` rows reproduces the reference's tile-then-crop
              modular window (reference: pipeline.py:29-35) for every item.
              ``min(lens)`` for plain banks (no wrap ever needed); the
              requested ``wrap_frames`` when the flat rows were cyclically
              tiled at build time. Static pytree metadata (a Python int, not
              a traced leaf) so `sample_batch` can gate the Pallas fast path
              at trace time and fall back to the XLA modular gather whenever
              a window longer than this could silently read zero padding.
    flat_scale: [N] float32 per-item dequantization scales, present only
              when ``flat`` is int8-quantized (``flat_dtype=int8``): item
              i's true values are ``flat[i] * flat_scale[i]``. Synthesis
              folds clip scales into the per-clip mix weights and the
              background scale into the kernel's window pass, so the
              accumulation stays float32-exact given the quantized inputs.
    data_shape: static [N, T_max, freq, chan] tuple — the shape ``data``
              has (or would have). Lets every consumer read geometry without
              touching ``data``, so ``data`` itself can be dropped.
    data:     None when built with ``data_resident=False``: the Pallas
              synthesis path reads only ``flat``/``lens``/``pos_mask``, so
              the dense float32 volume — which would otherwise DOMINATE the
              bank's HBM (it alone is ~7x the int8 flat layout) — need not
              exist on device at all. The XLA fallback paths require it and
              fail loudly on a slim bank.
    """
    data: Optional[jax.Array]
    lens: jax.Array
    pos_mask: jax.Array
    flat: Optional[jax.Array] = None
    contig_exact_frames: Optional[int] = None
    flat_scale: Optional[jax.Array] = None
    data_shape: Optional[tuple] = None

    def tree_flatten(self):
        return ((self.data, self.lens, self.pos_mask, self.flat,
                 self.flat_scale),
                (self.contig_exact_frames, self.data_shape))

    @classmethod
    def tree_unflatten(cls, aux, children):
        *rest, flat_scale = children
        return cls(*rest, contig_exact_frames=aux[0], flat_scale=flat_scale,
                   data_shape=aux[1])

    @property
    def f_pad(self) -> int:
        return self.flat.shape[-1]

    @property
    def shape(self) -> tuple:
        """[N, T_max, freq, chan] — valid even for slim (data=None) banks."""
        if self.data_shape is not None:
            return tuple(self.data_shape)
        return tuple(self.data.shape)

    @property
    def f_r(self) -> int:
        """Per-channel row stride inside ``flat`` (freq padded)."""
        return self.flat.shape[-1] // self.shape[-1]

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def t_max(self) -> int:
        return self.shape[1]


def flat_freq_pad(freq: int, chan: int) -> int:
    """Per-channel row stride of the channel-major flat layout: the smallest
    pad of ``freq`` that makes ``chan * f_r`` a multiple of 128 lanes."""
    import math
    step = 128 // math.gcd(chan, 128)
    return -(-freq // step) * step


def flat_row_align(flat_dtype) -> int:
    """TPU sublane granularity of the flat layout's dtype: DMA row starts
    and counts must be multiples of this (8 for f32, 16 for bf16)."""
    return 8 * (4 // np.dtype(flat_dtype).itemsize)


def normalize_flat_dtype(flat_dtype):
    """Accept the Config.bank_dtype strings alongside real dtypes (shared
    by the resident and streaming bank builders)."""
    if isinstance(flat_dtype, str):
        try:
            return {'float32': np.float32,
                    'bfloat16': jnp.bfloat16,
                    'int8': np.int8}[flat_dtype]
        except KeyError:
            raise ValueError(
                f'bank_dtype must be float32, bfloat16 or int8, got '
                f'{flat_dtype!r}') from None
    return flat_dtype


def build_bank(specs: Sequence[np.ndarray], t_max: Optional[int] = None,
               device=None, flat: bool = True,
               wrap_frames: Optional[int] = None,
               flat_dtype=np.float32, host: bool = False,
               data_resident: bool = True) -> SpecBank:
    """Pad a list of [freq, T_i, chan] arrays into a SpecBank.

    Input layout follows the reference convention [freq, time, chan*2]; the
    bank stores time-major [N, T, freq, chan].

    wrap_frames: when given (the training window length) and some item is
    shorter than it, the flat layout's rows are filled *cyclically* past each
    item's true length (row j holds frame j % len) and extended so that any
    contiguous ``wrap_frames``-row read at an offset the tile-then-crop draw
    can produce stays in bounds. A contiguous DMA then reproduces the
    reference's tiled background window (pipeline.py:29-35) bit-exactly —
    this is what lets the Pallas synthesis kernel handle backgrounds shorter
    than the window. Only background banks should set it: voice/noise banks
    must keep their zero tails (the kernel's sub-tile roll relies on them).

    flat_dtype: dtype of the ``flat`` layout only (``data`` stays float32 —
    the XLA fallback path and label masks are exact regardless). bfloat16
    halves the synthesis kernel's HBM traffic, which is what bounds pipeline
    throughput; mixing still accumulates in float32 inside the kernel, so
    only the stored spectrograms are rounded (~3 decimal digits, below the
    bf16 train step's own precision). int8 halves it AGAIN (4x dataset
    capacity per chip vs f32) with symmetric per-item max-abs quantization:
    the [N] ``flat_scale`` vector dequantizes at synthesis time — clip
    scales fold exactly into the per-clip mix weights and the background
    scale into the kernel's window pass, so quantization touches only the
    STORED spectrograms (relative error <= 1/254 of each item's peak).
    Opt-in; float32 keeps bit-exact pallas/XLA parity.

    host: return numpy leaves instead of committing the bank to the default
    device — used by the streaming rotation (`data/streaming.py`) to keep
    chunks of an HBM-oversized dataset in host RAM until their turn.

    data_resident=False drops the dense ``data`` volume entirely (the bank
    carries only flat/lens/pos_mask + the static ``data_shape``): the Pallas
    synthesis path never reads ``data``, which would otherwise dominate the
    bank's device HBM — it alone is ~2x the bf16 flat layout and ~7x the
    int8 one, so the reduced-precision capacity wins only materialize
    without it. This covers every training family on TPU, including se_v9's
    seperate_noise_voice targets (synthesized as per-source-group kernel
    calls — see mixture.sample_batch). The XLA fallback path (non-TPU
    backends, or backgrounds without wrap_frames coverage) needs ``data``
    and raises loudly on a slim bank — the training CLIs gate the flag
    accordingly.
    """
    specs = [np.asarray(s, np.float32) for s in specs]
    freq, _, chan = specs[0].shape
    lens = np.array([s.shape[1] for s in specs], np.int32)
    t_pad = int(lens.max()) if t_max is None else int(t_max)
    # an explicit t_max TRUNCATES longer items, so the stored length must
    # follow — otherwise downstream placement math (offset/shift draws in
    # mixture.py) would window a longer clip than the bank actually holds
    lens = np.minimum(lens, t_pad)
    out = np.zeros((len(specs), t_pad, freq, chan), np.float32)
    for i, s in enumerate(specs):
        t = min(s.shape[1], t_pad)
        out[i, :t] = s.transpose(1, 0, 2)[:t]
    pos_mask = (out.max(axis=(2, 3)) > 0).astype(np.float32)
    flat_arr = None
    contig = None
    flat_scale = None
    if flat:
        f_r = flat_freq_pad(freq, chan)
        al = flat_row_align(flat_dtype)
        contig = int(min(lens.min(), t_pad))
        wrap = wrap_frames is not None and contig < wrap_frames
        # +2*align tail rows then rounded to a multiple of align: the Pallas
        # kernel DMAs align-row supersets at align-aligned dynamic starts
        # (the TPU DMA engine requires row starts and counts on sublane
        # boundaries: 8 rows for f32, 16 for bf16).
        t_flat = -(-(t_pad + 2 * al) // al) * al
        if wrap:
            # size the tail TIGHTLY: the largest window offset the
            # tile-then-crop draw can produce for an item of length L is
            # ceil(n/L)*L - n, so the farthest DMA row is that offset plus
            # the round_align(n+align)-row superset. Naive t_pad+n sizing
            # inflated the item stride ~50% and cost ~11% pipeline
            # throughput (DMA locality) — measured round 3.
            max_off = 0
            for t in lens:
                # zero-length items: same guard as the kernel-side draw
                # (mixture.py clamps length to >= 1)
                t = max(int(min(t, t_pad)), 1)
                n_tile = -(-wrap_frames // t)
                max_off = max(max_off, n_tile * t - wrap_frames)
            stage = -(-(wrap_frames + al) // al) * al
            t_flat = max(t_flat, -(-(max_off + stage + al) // al) * al)
        flat_np = np.zeros((len(specs), t_flat, chan, f_r), np.float32)
        flat_np[:, :t_pad, :, :freq] = out.transpose(0, 1, 3, 2)
        if wrap:
            for i in range(len(specs)):
                t = max(int(min(lens[i], t_pad)), 1)
                idx = np.arange(t, t_flat) % t
                flat_np[i, t:, :, :freq] = out[i, idx].transpose(0, 2, 1)
            contig = int(wrap_frames)
        flat_np = flat_np.reshape(len(specs), t_flat, chan * f_r)
        if np.dtype(flat_dtype) == np.int8:
            # symmetric per-item max-abs quantization; all-zero items get
            # scale 1.0 (their quantized rows are exactly zero either way)
            peak = np.abs(flat_np).max(axis=(1, 2))
            scale_np = np.where(peak > 0, peak / 127.0, 1.0).astype(
                np.float32)
            flat_np = np.clip(
                np.round(flat_np / scale_np[:, None, None]),
                -127, 127).astype(np.int8)
            flat_scale = scale_np if host else jnp.asarray(scale_np)
            flat_arr = flat_np if host else jnp.asarray(flat_np)
        else:
            flat_arr = (flat_np.astype(flat_dtype) if host
                        else jnp.asarray(flat_np, dtype=flat_dtype))
    data_shape = tuple(out.shape)
    if not data_resident:
        assert flat, 'data_resident=False requires the flat layout'
        out = None
    if host:
        return SpecBank(out, lens, pos_mask, flat_arr,
                        contig_exact_frames=contig, flat_scale=flat_scale,
                        data_shape=data_shape)
    data = None if out is None else jnp.asarray(out)
    lens = jnp.asarray(lens)
    pos_mask = jnp.asarray(pos_mask)
    if device is not None:
        data = data if data is None else jax.device_put(data, device)
        lens = jax.device_put(lens, device)
        pos_mask = jax.device_put(pos_mask, device)
        if flat_arr is not None:
            flat_arr = jax.device_put(flat_arr, device)
        if flat_scale is not None:
            flat_scale = jax.device_put(flat_scale, device)
    return SpecBank(data, lens, pos_mask, flat_arr,
                    contig_exact_frames=contig, flat_scale=flat_scale,
                    data_shape=data_shape)


def remap_labels(labels: np.ndarray, n_classes: int) -> np.ndarray:
    """30-class -> 3-class remap + one-hot (reference: sj_train.py:86-88)."""
    labels = np.asarray(labels)
    if labels.max() - 1 != n_classes:
        labels = labels // 10
    return np.eye(n_classes, dtype='float32')[labels]
