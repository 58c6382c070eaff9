"""Host-streaming bank rotation: train on spec sets larger than device HBM.

The reference streams its whole spec set from host RAM through tf.data
generators, so its dataset capacity is host memory (reference:
pipeline.py:143-156, utils.py:88-94). The fused TPU path instead keeps
banks HBM-resident — much faster, but a *single chip* caps the dataset at
its HBM (``--bank_shard`` scales capacity with chips, ``--bank_dtype
bfloat16`` doubles it; neither helps a one-chip host with a 100 GB spec
set). This module closes that gap:

* :func:`build_streaming_banks` shuffles each source list once (seeded),
  deals it round-robin into ``n_chunks`` *host-resident* chunk banks with
  IDENTICAL array shapes (global time pad, cyclic item-count pad, unified
  flat-row pad and ``contig_exact_frames``) — so every chunk reuses ONE
  compiled fused-step program;
* :class:`StreamingBanks` rotates the chunks through the device: while the
  train step runs on chunk *i*, chunk *i+1*'s ``jax.device_put`` upload is
  already in flight (JAX transfers are async), so rotation overlaps compute
  and the steady-state HBM footprint is two chunks.

Shuffle semantics vs the reference: tf.data's ``.repeat().shuffle(len)``
is a sliding-buffer shuffle over a continuous stream; here an example's
sources come from the device-resident chunk only, with without-replacement
permutation draws inside the chunk (`mixture._stream_draw`) and chunks
rotating every ``chunk_steps`` dispatches. Long-run per-item frequencies
are uniform in both (chunks are dealt round-robin from one global shuffle
and each gets equal dispatch time; items cyclically padded into a chunk are
drawn proportionally more often inside it — keep counts divisible by
``n_chunks`` for exact uniformity).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import numpy as np

from challenge_tpu.data.mixture import Banks
from challenge_tpu.data.specset import (
    build_bank, normalize_flat_dtype, remap_labels)


def _deal(items: Sequence, perm: np.ndarray, n_chunks: int) -> List[list]:
    """Round-robin the permuted items into n_chunks lists, every chunk
    non-empty (short lists wrap: item perm[i % n] for i in range(n_chunks))
    and padded cyclically to a common per-chunk count."""
    n = len(items)
    order = [int(perm[i % n]) for i in range(max(n, n_chunks))]
    chunks = [order[c::n_chunks] for c in range(n_chunks)]
    per = max(len(c) for c in chunks)
    return [[items[c[i % len(c)]] for i in range(per)] for c in chunks]


def _pad_flat_rows(bank, t_flat: int):
    """Zero-extend the flat layout's row axis to ``t_flat`` (rows past each
    item's own wrap-tail sizing are never DMA'd — padding only equalizes
    shapes across chunks)."""
    flat = bank.flat
    if flat.shape[1] == t_flat:
        return bank
    pad = np.zeros((flat.shape[0], t_flat - flat.shape[1], flat.shape[2]),
                   flat.dtype)
    return dataclasses.replace(bank, flat=np.concatenate([flat, pad], 1))


def build_streaming_banks(backgrounds, voices, labels, noises=None,
                          n_chunks: int = 2, n_classes: int = 3,
                          one_hot: bool = True,
                          n_frame: Optional[int] = None,
                          flat_dtype=np.float32, seed: int = 0,
                          chunk_steps: int = 4,
                          data_resident: bool = True) -> 'StreamingBanks':
    """Host lists -> a :class:`StreamingBanks` rotation of ``n_chunks``
    equal-shape chunk banks (the streaming analogue of
    ``pipeline.build_banks``; same label handling, reference:
    sj_train.py:86-88).

    All chunks share every array shape AND the static
    ``contig_exact_frames`` metadata, so the fused train step compiles
    exactly once and every chunk reuses the program.
    """
    if n_chunks < 2:
        raise ValueError('streaming needs n_chunks >= 2 '
                         '(use build_banks for a resident dataset)')
    flat_dtype = normalize_flat_dtype(flat_dtype)
    labels = np.asarray(labels)
    if one_hot and labels.ndim == 1:
        labels = remap_labels(labels, n_classes)
    rng = np.random.default_rng(seed)

    bg_chunks = _deal(backgrounds, rng.permutation(len(backgrounds)),
                      n_chunks)
    vperm = rng.permutation(len(voices))     # voices + labels stay aligned
    vo_chunks = _deal(voices, vperm, n_chunks)
    lab_chunks = _deal(list(labels), vperm, n_chunks)
    no_chunks = (_deal(noises, rng.permutation(len(noises)), n_chunks)
                 if noises is not None else None)

    def role_banks(chunks, wrap, t_max):
        # data_resident=False additionally halves-or-better each chunk's
        # UPLOAD bytes (the rotation's bound on slow h2d links): only the
        # flat layout + masks ride the device_put
        banks = [build_bank(c, t_max=t_max, wrap_frames=wrap,
                            flat_dtype=flat_dtype, host=True,
                            data_resident=data_resident)
                 for c in chunks]
        t_flat = max(b.flat.shape[1] for b in banks)
        contig = min(b.contig_exact_frames for b in banks)
        return [dataclasses.replace(_pad_flat_rows(b, t_flat),
                                    contig_exact_frames=contig)
                for b in banks]

    bg_t = max(s.shape[1] for s in backgrounds)
    vo_t = max(s.shape[1] for s in voices)
    bg_banks = role_banks(bg_chunks, n_frame, bg_t)
    vo_banks = role_banks(vo_chunks, None, vo_t)
    no_banks = (role_banks(no_chunks, None,
                           max(s.shape[1] for s in noises))
                if noises is not None else [None] * n_chunks)
    chunks = [Banks(bg, vo, np.stack(lab).astype(np.float32), no)
              for bg, vo, lab, no in zip(bg_banks, vo_banks, lab_chunks,
                                         no_banks)]
    return StreamingBanks(chunks, chunk_steps=chunk_steps)


class StreamingBanks:
    """Rotates host-resident chunk banks through the device.

    ``next_banks()`` returns the device-resident chunk for one fused-step
    dispatch and, every ``chunk_steps`` dispatches, advances the rotation:
    the next chunk's upload was already dispatched when the current one
    became active (async ``device_put``), so the swap is free when a
    chunk's dispatches take longer than its upload. Steady-state device
    HBM is ~``2 * dataset_bytes / n_chunks`` (current + prefetched next;
    transiently 3 chunks at a swap while the last dispatch on the evicted
    chunk is still in flight).

    The rotation is host state, derived state on resume: the cursor is a
    pure function of the dispatch count (``idx = (dispatches //
    chunk_steps) % n_chunks``), and every fused dispatch advances exactly
    ``steps_per_call`` optimizer steps — so a restored Orbax train state
    determines the rotation position exactly. :meth:`restore_cursor`
    fast-forwards to it; ``TrainLoop.fit`` calls it automatically, making
    ``--resume`` continue the chunk schedule precisely where the
    uninterrupted run would be (no extra checkpoint artifact needed).
    """

    def __init__(self, chunks: Sequence[Banks], chunk_steps: int = 4,
                 placement=None):
        if not chunks:
            raise ValueError('no chunks')
        self.chunks = list(chunks)
        self.chunk_steps = max(int(chunk_steps), 1)
        self._placement = placement
        self._dispatches = 0
        self._idx = 0
        # uploads are lazy: the first peek()/next_banks() materializes the
        # current+next chunks, so a set_placement() between construction
        # and first use (the TrainLoop mesh path) costs no wasted transfer
        self._cur = None
        self._next = None

    def set_placement(self, sharding) -> None:
        """Place all future uploads with ``sharding`` (e.g. replicated over
        a mesh). Drops any chunks already uploaded to the old placement."""
        self._placement = sharding
        self._cur = None
        self._next = None

    def _put(self, chunk: Banks) -> Banks:
        if self._placement is None:
            return jax.tree.map(jax.device_put, chunk)
        return jax.tree.map(
            lambda x: jax.device_put(x, self._placement), chunk)

    def _ensure(self) -> None:
        if self._cur is None:
            self._cur = self._put(self.chunks[self._idx])
        if self._next is None and len(self.chunks) > 1:
            nxt = (self._idx + 1) % len(self.chunks)
            self._next = self._put(self.chunks[nxt])

    @property
    def n_chunks(self) -> int:
        return len(self.chunks)

    @property
    def dispatches(self) -> int:
        """Total ``next_banks()`` calls so far (the rotation's clock)."""
        return self._dispatches

    @property
    def current_chunk(self) -> int:
        """Index of the chunk the next dispatch will train on."""
        return self._idx

    def restore_cursor(self, dispatches: int) -> None:
        """Fast-forward the rotation to where it would be after
        ``dispatches`` :meth:`next_banks` calls — exact resume for streamed
        corpora: the caller derives the count from the restored optimizer
        step (``step // steps_per_call``; every fused dispatch advances
        exactly ``steps_per_call`` steps). Uploaded chunks are dropped so
        the chunk at the new cursor (re-)uploads lazily — except when the
        cursor is already exactly there (a reused ``TrainLoop.fit``
        continuing its own run calls this every fit), where dropping
        would re-upload up to two near-HBM-sized chunks for nothing."""
        dispatches = max(int(dispatches), 0)
        if dispatches == self._dispatches:
            return
        self._dispatches = dispatches
        self._idx = ((dispatches // self.chunk_steps) % len(self.chunks)
                     if len(self.chunks) > 1 else 0)
        self._cur = None
        self._next = None

    def peek(self) -> Banks:
        """The device-resident chunk, without advancing the rotation."""
        self._ensure()
        return self._cur

    def next_banks(self) -> Banks:
        self._ensure()
        banks = self._cur
        self._dispatches += 1
        if (len(self.chunks) > 1
                and self._dispatches % self.chunk_steps == 0):
            self._idx = (self._idx + 1) % len(self.chunks)
            self._cur = self._next
            self._next = None
            self._ensure()   # dispatch the new next chunk's upload now
        return banks
