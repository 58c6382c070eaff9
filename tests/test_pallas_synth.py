"""Pallas synthesis kernel tests (interpret mode on CPU; the real-TPU parity
check — bit-exact against the XLA path — runs in bench.py on hardware).

Mosaic constraints the kernel and SpecBank.flat layout encode (found
empirically on v5e: unaligned dynamic DMA row starts or non-multiple-of-8 DMA
row counts crash the compiler):
  * flat banks are 128-lane padded and 8-row aligned,
  * dynamic offsets are applied as aligned-base DMA/store + sub-tile roll.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from challenge_tpu.data.mixture import _scatter_clips, sample_batch
from challenge_tpu.data.pipeline import build_banks
from challenge_tpu.ops.pallas_synth import synthesize_windows


def test_flat_bank_layout():
    rng = np.random.default_rng(0)
    specs = [rng.standard_normal((257, t, 4)).astype('f4')
             for t in (30, 50, 41)]
    from challenge_tpu.data.specset import build_bank
    bank = build_bank(specs)
    assert bank.flat.shape[-1] % 128 == 0
    assert bank.flat.shape[1] % 8 == 0
    assert bank.flat.shape[1] >= bank.t_max + 16
    # channel-major flat content matches data: column c*f_r + f
    f_r = bank.f_r
    assert f_r >= 257 and 4 * f_r == bank.flat.shape[-1]
    planes = np.asarray(bank.flat[1, :50]).reshape(50, 4, f_r)
    np.testing.assert_array_equal(planes[:, :, :257].transpose(0, 2, 1),
                                  np.asarray(bank.data[1, :50]))
    np.testing.assert_array_equal(planes[:, :, 257:], 0)


def test_synthesize_windows_matches_scatter_interpret():
    rng = np.random.default_rng(1)
    b, nf, f = 4, 64, 128
    bgbank = jnp.asarray(rng.standard_normal((3, 96, f)).astype('f4'))
    vbank = jnp.asarray(rng.standard_normal((5, 24, f)).astype('f4'))
    nbank = jnp.asarray(rng.standard_normal((4, 16, f)).astype('f4'))
    bidx = jnp.asarray(rng.integers(0, 3, b), jnp.int32)
    boff = jnp.asarray(rng.integers(0, 96 - nf, b), jnp.int32)
    vidx = jnp.asarray(rng.integers(0, 5, (b, 3)), jnp.int32)
    nidx = jnp.asarray(rng.integers(0, 4, (b, 2)), jnp.int32)
    vshift = jnp.asarray(rng.integers(-20, nf, (b, 3)), jnp.int32)
    nshift = jnp.asarray(rng.integers(-12, nf, (b, 2)), jnp.int32)
    vw = jnp.asarray(rng.uniform(0.1, 1, (b, 3)).astype('f4'))
    nw = jnp.asarray(rng.uniform(0.1, 1, (b, 2)).astype('f4'))

    out = synthesize_windows(nf, bgbank, bidx, boff, vbank, vidx, vshift, vw,
                             nbank, nidx, nshift, nw, interpret=True)

    # reference: gather bg rows + scatter-add of clips
    rows = boff[:, None] + jnp.arange(nf)[None, :]
    ref = bgbank[bidx[:, None], rows]                  # [B, nf, f]
    ref = _scatter_clips(ref[..., None], vw, vbank[vidx][..., None],
                         vshift)
    ref = _scatter_clips(ref, nw, nbank[nidx][..., None], nshift)[..., 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_synthesize_windows_quantized_clip_dmas_interpret():
    """Per-clip length tables: chunks past a clip's true length are skipped
    and zeroed. Adversarial pattern: a LONG clip then a SHORT one through
    the same double-buffer slot — stale rows from the long clip must not
    leak into the short one's skipped chunks."""
    rng = np.random.default_rng(4)
    b, nf, f = 2, 64, 128
    t_v = 96   # 3 chunks of 32
    # clip i has true length lens[i]; rows past it are ZERO (bank contract)
    lens = np.array([96, 20, 50, 96], np.int32)
    vbank = rng.standard_normal((4, t_v, f)).astype('f4')
    for i, l in enumerate(lens):
        vbank[i, l:] = 0.0
    vbank = jnp.asarray(vbank)
    bgbank = jnp.asarray(rng.standard_normal((2, 128, f)).astype('f4'))
    bidx = jnp.asarray([0, 1], jnp.int32)
    boff = jnp.asarray([3, 40], jnp.int32)
    # voice draw order per sample: same slot sees len-96 then len-50/20
    vidx = jnp.asarray([[0, 1, 2], [3, 2, 1]], jnp.int32)
    vshift = jnp.asarray(rng.integers(-10, nf, (b, 3)), jnp.int32)
    vw = jnp.asarray(rng.uniform(0.5, 1, (b, 3)).astype('f4'))
    vlens = jnp.asarray(lens)[vidx]

    out = synthesize_windows(nf, bgbank, bidx, boff, vbank, vidx, vshift,
                             vw, vlens=vlens, interpret=True)
    # oracle: plain gather + scatter (full-length copies; banks are
    # zero-padded so quantization must be invisible)
    rows = boff[:, None] + jnp.arange(nf)[None, :]
    ref = bgbank[bidx[:, None], rows]
    ref = _scatter_clips(ref[..., None], vw, vbank[vidx][..., None],
                         vshift)[..., 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sample_batch_pallas_interpret_matches_xla(monkeypatch):
    """Full sample_batch equality: the pallas path draws the same RNG stream,
    so outputs must match the XLA path exactly."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(2)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)])
    key = jax.random.PRNGKey(7)
    spec_pl, y_pl = sample_batch(key, banks, 4, 64, use_pallas=True)
    spec_x, y_x = sample_batch(key, banks, 4, 64, use_pallas=False)
    np.testing.assert_allclose(np.asarray(spec_pl), np.asarray(spec_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(y_pl), np.asarray(y_x))

    # fused-magnitude mode: same RNG stream, |.| computed on the kernel's
    # channel-major flat output vs the XLA scatter spec
    m_pl, my_pl = sample_batch(key, banks, 4, 64, use_pallas=True,
                               layout='tfc', magnitude=True)
    m_x, my_x = sample_batch(key, banks, 4, 64, use_pallas=False,
                             layout='tfc', magnitude=True)
    assert m_pl.shape == (4, 64, 2, 257)
    np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(my_pl), np.asarray(my_x))


def test_sample_batch_pallas_short_background_wraps(monkeypatch):
    """Backgrounds shorter than n_frame must TILE (reference:
    pipeline.py:29-35), not zero-fill. With wrap_frames-built banks the
    pallas path's contiguous DMA must equal the XLA modular gather
    bit-exactly; without wrap_frames the static gate must fall back to XLA
    (same result, no silent zero tail)."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows
    calls = []

    def interp(*args, **kw):
        calls.append(1)
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(9)
    n_frame = 64
    # one background is n_frame // 3 frames: every window needs >= 3 tiles
    bgs = [rng.standard_normal((257, t, 4)).astype('f4')
           for t in (94, n_frame // 3, 70)]
    voices = [rng.standard_normal((257, 40, 4)).astype('f4')
              for _ in range(4)]
    noises = [rng.standard_normal((257, 20, 4)).astype('f4')
              for _ in range(3)]
    labels = rng.integers(0, 3, size=4)

    banks = build_banks(bgs, voices, labels, noises, n_frame=n_frame)
    assert banks.backgrounds.contig_exact_frames == n_frame
    key = jax.random.PRNGKey(21)
    # use enough batch rows that the short background is certainly drawn
    spec_pl, y_pl = sample_batch(key, banks, 8, n_frame, use_pallas=True)
    assert calls, 'wrap-built bank must keep the pallas fast path'
    spec_x, y_x = sample_batch(key, banks, 8, n_frame, use_pallas=False)
    np.testing.assert_allclose(np.asarray(spec_pl), np.asarray(spec_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(y_pl), np.asarray(y_x))
    # the short background must actually appear with real (wrapped) content:
    # no window row of any sample may be all-zero
    assert (np.abs(np.asarray(spec_pl)).max(axis=(1, 3)) > 0).all()

    # un-wrapped bank: static gate falls back to XLA, identical output
    calls.clear()
    plain = build_banks(bgs, voices, labels, noises)
    assert plain.backgrounds.contig_exact_frames == n_frame // 3
    spec_fb, y_fb = sample_batch(key, plain, 8, n_frame, use_pallas=True)
    assert not calls, 'short un-wrapped bank must not reach the kernel'
    np.testing.assert_array_equal(np.asarray(spec_fb), np.asarray(spec_x))
    np.testing.assert_array_equal(np.asarray(y_fb), np.asarray(y_x))


@pytest.mark.slow
def test_pallas_fuzz_random_configs(monkeypatch):
    """Seeded fuzz over bank/window geometries: clip lengths at the 32-row
    DMA-chunk boundary (31/32/33), odd batch sizes, several short wrapped
    backgrounds at once, a no-noise bank, varying n_frame. Pallas
    (interpret) must match the XLA path on every draw — guards the DMA
    offset / roll / wrap arithmetic across shapes, not just the standard
    config."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    cases = [
        # seed, n_frame, bg_lens, n_voices, (v_lo, v_hi), n_noises, b, mv, mn
        (0, 72, (80, 24), 5, (31, 34), 2, 3, 1, 1),
        (1, 96, (100, 32, 33), 6, (20, 70), 0, 5, 3, 2),
        (2, 128, (130, 43), 4, (32, 33), 3, 6, 7, 2),
        (3, 64, (21, 22, 23), 5, (8, 90), 2, 4, 2, 2),
    ]
    for seed, n_frame, bg_lens, nv, (v_lo, v_hi), nn, b, mv, mn in cases:
        rng = np.random.default_rng(100 + seed)
        bgs = [rng.standard_normal((257, t, 4)).astype('f4')
               for t in bg_lens]
        voices = [rng.standard_normal(
            (257, int(rng.integers(v_lo, v_hi + 1)), 4)).astype('f4')
            for _ in range(nv)]
        labels = rng.integers(0, 3, size=nv)
        noises = [rng.standard_normal(
            (257, int(rng.integers(5, 40)), 4)).astype('f4')
            for _ in range(nn)] or None
        banks = build_banks(bgs, voices, labels, noises, n_frame=n_frame)
        key = jax.random.PRNGKey(seed)
        kw = dict(max_voices=mv, max_noises=mn)
        s_pl, y_pl = sample_batch(key, banks, b, n_frame,
                                  use_pallas=True, **kw)
        s_x, y_x = sample_batch(key, banks, b, n_frame,
                                use_pallas=False, **kw)
        np.testing.assert_allclose(
            np.asarray(s_pl), np.asarray(s_x), rtol=1e-5, atol=1e-6,
            err_msg=f'case seed={seed}')
        np.testing.assert_array_equal(np.asarray(y_pl), np.asarray(y_x))


def test_sample_batch_bf16_banks_interpret(monkeypatch):
    """bfloat16 flat banks (build_banks(flat_dtype=...)): the kernel DMAs
    half the bytes but weights/accumulates in f32, so the pallas output must
    track the exact f32 XLA path to bf16 storage tolerance; labels (built
    from f32 pos_masks) stay bit-identical. Includes a wrapped short
    background so the 16-row-aligned cyclic tiling path is covered too."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(12)
    n_frame = 64
    data = (
        [rng.standard_normal((257, t, 4)).astype('f4') * 0.1
         for t in (94, n_frame // 3, 70)],
        [rng.standard_normal((257, 40, 4)).astype('f4') * 0.1
         for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') * 0.1
         for _ in range(3)])
    banks16 = build_banks(*data, n_frame=n_frame, flat_dtype=jnp.bfloat16)
    banks32 = build_banks(*data, n_frame=n_frame)
    assert banks16.backgrounds.flat.dtype == jnp.bfloat16
    assert banks16.voices.flat.shape[1] % 16 == 0

    key = jax.random.PRNGKey(23)
    spec16, y16 = sample_batch(key, banks16, 8, n_frame, use_pallas=True)
    spec32, y32 = sample_batch(key, banks32, 8, n_frame, use_pallas=False)
    assert spec16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))
    s16, s32 = np.asarray(spec16, np.float32), np.asarray(spec32)
    # bf16 storage rounds each input to ~2^-8 relative; sums of <=10 clips
    np.testing.assert_allclose(s16, s32, atol=2e-2, rtol=2e-2)
    # and the rounding must actually be the ONLY difference: tight mean err
    assert np.abs(s16 - s32).mean() < 2e-4

    # the fused flat-magnitude mode used by the training feature chain
    m16, my16 = sample_batch(key, banks16, 8, n_frame, use_pallas=True,
                             layout='tfc', magnitude='flat')
    m32, my32 = sample_batch(key, banks32, 8, n_frame, use_pallas=False,
                             layout='tfc', magnitude='flat')
    np.testing.assert_array_equal(np.asarray(my16), np.asarray(my32))
    np.testing.assert_allclose(np.asarray(m16, np.float32), np.asarray(m32),
                               atol=2e-2, rtol=2e-2)


def test_int8_bank_quantization_unit():
    """int8 flat banks store symmetric per-item max-abs quantization: the
    dequantized layout must match the f32 one to half a quantization step
    per element, rows must meet int8's 32-row sublane alignment, and
    all-zero items must get scale 1.0 (no 0/0)."""
    rng = np.random.default_rng(3)
    specs = [rng.standard_normal((257, t, 4)).astype('f4') * (0.03 * (i + 1))
             for i, t in enumerate((90, 41, 64))]
    specs.append(np.zeros((257, 30, 4), 'f4'))      # all-zero item
    from challenge_tpu.data.specset import build_bank
    b8 = build_bank(specs, flat_dtype=np.int8)
    b32 = build_bank(specs)
    assert b8.flat.dtype == jnp.int8
    assert b8.flat.shape[1] % 32 == 0
    assert b8.flat_scale.shape == (4,) and b32.flat_scale is None
    sc = np.asarray(b8.flat_scale)
    assert sc[3] == 1.0 and np.all(sc > 0)
    deq = np.asarray(b8.flat, np.float32) * sc[:, None, None]
    f32 = np.asarray(b32.flat, np.float32)[:, :b8.flat.shape[1]]
    # rows can differ in count (32- vs 8-row alignment); compare the shared
    # extent and bound by half a step per item
    n_rows = min(deq.shape[1], f32.shape[1])
    err = np.abs(deq[:, :n_rows] - f32[:, :n_rows]).max(axis=(1, 2))
    np.testing.assert_array_less(err, sc / 2 + 1e-9)


@pytest.mark.slow
def test_sample_batch_int8_banks_interpret(monkeypatch):
    """int8 flat banks (build_banks(flat_dtype='int8')): the kernel DMAs a
    quarter of the f32 bytes; clip dequant scales fold into the mix weights
    and the background scale into the window pass, all accumulating in f32
    — so the pallas output must track the exact f32 XLA path to int8
    storage tolerance, labels bit-identical (they come from f32 pos_masks).
    Includes a wrapped short background (32-row-aligned cyclic tiling)."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(12)
    n_frame = 64
    data = (
        [rng.standard_normal((257, t, 4)).astype('f4') * 0.1
         for t in (94, n_frame // 3, 70)],
        [rng.standard_normal((257, 40, 4)).astype('f4') * 0.1
         for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') * 0.1
         for _ in range(3)])
    banks8 = build_banks(*data, n_frame=n_frame, flat_dtype='int8')
    banks32 = build_banks(*data, n_frame=n_frame)
    assert banks8.backgrounds.flat.dtype == jnp.int8
    assert banks8.voices.flat.shape[1] % 32 == 0
    assert banks8.backgrounds.flat_scale is not None

    key = jax.random.PRNGKey(23)
    spec8, y8 = sample_batch(key, banks8, 8, n_frame, use_pallas=True)
    spec32, y32 = sample_batch(key, banks32, 8, n_frame, use_pallas=False)
    # int8 banks synthesize into bf16 (a float dtype is required; bf16
    # keeps the output DMA at the bf16-bank size)
    assert spec8.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(y32))
    s8, s32 = np.asarray(spec8, np.float32), np.asarray(spec32)
    # per-element error bound: half a quantization step (~peak/254) per
    # contributing source, <= 10 weighted sources, plus bf16 output rounding
    np.testing.assert_allclose(s8, s32, atol=4e-2, rtol=4e-2)
    # and quantization+rounding must be the ONLY difference: the analytic
    # floor is the background's own quant noise, step/4 = (2*peak/254)/4
    # ~ 8.5e-4 for this 0.1-std data (measured 8.6e-4); 2x headroom
    assert np.abs(s8 - s32).mean() < 1.7e-3

    # the fused flat-magnitude mode used by the training feature chain
    m8, my8 = sample_batch(key, banks8, 8, n_frame, use_pallas=True,
                           layout='tfc', magnitude='flat')
    m32, my32 = sample_batch(key, banks32, 8, n_frame, use_pallas=False,
                             layout='tfc', magnitude='flat')
    assert m8.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(my8), np.asarray(my32))
    np.testing.assert_allclose(np.asarray(m8, np.float32), np.asarray(m32),
                               atol=4e-2, rtol=4e-2)


def test_slim_banks_pallas_bitexact_and_fallback_loud(monkeypatch):
    """data_resident=False drops the dense f32 `data` volume (the HBM
    dominator — it alone outweighs the whole bf16/int8 flat layout): the
    Pallas path must produce BIT-identical batches from a slim bank, the
    static geometry must survive via data_shape, and the XLA fallback must
    fail loudly instead of synthesizing garbage."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(7)
    n_frame = 64
    data = (
        [rng.standard_normal((257, t, 4)).astype('f4') * 0.1
         for t in (94, 70)],
        [rng.standard_normal((257, 40, 4)).astype('f4') * 0.1
         for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') * 0.1
         for _ in range(3)])
    full = build_banks(*data, n_frame=n_frame)
    slim = build_banks(*data, n_frame=n_frame, data_resident=False)
    for bank in (slim.backgrounds, slim.voices, slim.noises):
        assert bank.data is None and bank.flat is not None
        assert bank.shape == bank.data_shape and len(bank.shape) == 4
    assert slim.backgrounds.shape == tuple(full.backgrounds.data.shape)
    # the slim banks' device bytes are just flat + masks: the f32 volume
    # (comparable in size to the whole f32 flat layout) is gone, and with
    # int8 quantization the total drops to ~1/5 of the default f32 bank
    def dev_bytes(banks):
        return sum(x.nbytes for x in jax.tree.leaves(banks))
    assert dev_bytes(slim) < 0.65 * dev_bytes(full)
    slim8 = build_banks(*data, n_frame=n_frame, data_resident=False,
                        flat_dtype='int8')
    # 0.30 here (tiny 20-40-row test clips overstate int8's 32-row
    # alignment padding); at production clip lengths the ratio is ~1/7
    assert dev_bytes(slim8) < 0.35 * dev_bytes(full)

    key = jax.random.PRNGKey(11)
    spec_s, y_s = sample_batch(key, slim, 8, n_frame, use_pallas=True)
    spec_f, y_f = sample_batch(key, full, 8, n_frame, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(spec_s), np.asarray(spec_f))
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_f))

    with pytest.raises(AssertionError, match='data_resident=False'):
        sample_batch(key, slim, 8, n_frame, use_pallas=False)


@pytest.mark.slow
def test_sample_batch_tfc_layout_is_a_transpose():
    """layout='tfc' must be exactly the reference layout with freq/time
    swapped (same RNG stream, same values)."""
    rng = np.random.default_rng(5)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)])
    key = jax.random.PRNGKey(13)
    s_ref, y_ref = sample_batch(key, banks, 4, 64, layout='ftc')
    s_tfc, y_tfc = sample_batch(key, banks, 4, 64, layout='tfc')
    np.testing.assert_array_equal(np.asarray(s_ref),
                                  np.asarray(s_tfc).swapaxes(1, 2))
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_tfc))
    # magnitude mode == |tfc spec| with chan pairs, chan-then-freq layout
    m, y_m = sample_batch(key, banks, 4, 64, layout='tfc', magnitude=True)
    s = np.asarray(s_tfc)
    expect = np.sqrt(s[..., :2] ** 2 + s[..., 2:] ** 2)
    np.testing.assert_allclose(np.asarray(m),
                               np.moveaxis(expect, -1, -2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_m))


def test_feature_fn_fused_mag_matches_spec_path(monkeypatch):
    """make_feature_fn's fused-magnitude path (n_chan=2) must produce the
    same mel features as the explicit complex->|.|->mel chain."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    rng = np.random.default_rng(3)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)])
    cfg = Config(model_type='vad', v=8, n_mels=40, n_frame=64, n_chan=2,
                 batch_size=4)
    key = jax.random.PRNGKey(11)
    x_pl, y_pl = make_feature_fn(cfg, training=True, use_pallas=True)(
        key, banks)
    x_x, y_x = make_feature_fn(cfg, training=True, use_pallas=False)(
        key, banks)
    assert x_pl.shape == (4, 40, 64, 2)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_pl), np.asarray(y_x))


@pytest.mark.parametrize('name', ['', 'filter'])
def test_feature_fn_fused_mag_matches_unfused_chain(name):
    """The fused flat-magnitude rewrite (flat SpecAugment + block-diagonal
    mel on the channel-major layout) vs the explicit complex -> |.| -> mel
    chain it replaced — BOTH on the XLA path, so this isolates the fused
    commutation/layout reasoning itself (pallas-vs-XLA equality is covered
    separately). Same key => same draws; outputs must match to float
    tolerance, with and without the stft_filter column products."""
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    rng = np.random.default_rng(8)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)])
    cfg = Config(model_type='vad', v=8, n_mels=40, n_frame=64, n_chan=2,
                 batch_size=4, name=name)
    key = jax.random.PRNGKey(17)
    x_f, y_f = make_feature_fn(cfg, training=True, use_pallas=False,
                               fused_mag=True)(key, banks)
    x_u, y_u = make_feature_fn(cfg, training=True, use_pallas=False,
                               fused_mag=False)(key, banks)
    assert x_f.shape == x_u.shape == (4, 40, 64, 2)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_u))


@pytest.mark.parametrize('name,variant,training', [
    ('', 'sj', True),
    ('filter', 'sj', True),
    ('', 'sj', False),
    ('', 'density', True),
])
def test_feature_fn_fused_mel_matches_unfused(monkeypatch, name, variant,
                                              training):
    """The opt-in fused_mel path (|.| + masks + mel GEMM + minmax INSIDE the
    synthesis kernel) vs the default in-kernel-magnitude + XLA-mel chain:
    same key => identical RNG stream (batch_mask_keep is the mask-producing
    half of batch_mask), so features must match to GEMM-reduction-order
    tolerance and labels bit-exactly — incl. the stft_filter column
    products, the eval (no-mask) path and the density label/normalize
    epilogue."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    rng = np.random.default_rng(14)
    n_cls = 30 if variant == 'density' else 3
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, n_cls, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)],
        n_classes=n_cls, n_frame=64)
    mt, v = ('eff', 0) if variant == 'density' else ('vad', 8)
    cfg = Config(model_type=mt, v=v, n_mels=40, n_frame=64, n_chan=2,
                 batch_size=4, name=name)
    key = jax.random.PRNGKey(19)
    x_f, y_f = make_feature_fn(cfg, training=training, variant=variant,
                               use_pallas=True, fused_mel=True)(key, banks)
    x_u, y_u = make_feature_fn(cfg, training=training, variant=variant,
                               use_pallas=True, fused_mel=False)(key, banks)
    assert x_f.shape == x_u.shape
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=1e-6, atol=0)


@pytest.mark.parametrize('bank_dtype', ['bfloat16', 'int8'])
@pytest.mark.slow
def test_feature_fn_fused_mel_reduced_precision_banks(monkeypatch,
                                                      bank_dtype):
    """fused_mel composes with the reduced-precision bank dtypes: the
    in-kernel epilogue reads the f32 accumulation scratch directly (bf16
    banks: no intermediate bf16 magnitude rounding; int8 banks: the
    background dequant scale applies in the window pass BEFORE the |.|,
    and the mel output stays f32 — the out_dtype narrowing is
    non-mel-mode only). Against the unfused chain on the SAME banks the
    only divergence is the unfused path's bank-dtype magnitude rounding;
    labels must stay bit-identical. int8 banks are built SLIM
    (data_resident=False) so this also pins fused_mel never touching the
    dense volume."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    rng = np.random.default_rng(16)
    data = (
        [rng.standard_normal((257, 94, 4)).astype('f4') * 0.1
         for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') * 0.1
         for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') * 0.1
         for _ in range(3)])
    banks = build_banks(*data, n_frame=64, flat_dtype=bank_dtype,
                        data_resident=(bank_dtype != 'int8'))
    if bank_dtype == 'int8':
        assert banks.voices.data is None
        assert banks.backgrounds.flat_scale is not None
    cfg = Config(model_type='vad', v=8, n_mels=40, n_frame=64, n_chan=2,
                 batch_size=4)
    key = jax.random.PRNGKey(31)
    x_f, y_f = make_feature_fn(cfg, training=True,
                               use_pallas=True, fused_mel=True)(key, banks)
    x_u, y_u = make_feature_fn(cfg, training=True,
                               use_pallas=True, fused_mel=False)(key, banks)
    assert x_f.shape == x_u.shape == (4, 40, 64, 2)
    assert x_f.dtype == jnp.float32          # mel-mode output is always f32
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_u))
    # unfused rounds the magnitude to the bank dtype before the XLA mel;
    # fused keeps it f32 in VMEM. The bounds are EMPIRICAL for these fixed
    # seeds, not derived (a near-min element after minmax+log can exceed
    # what the storage format's ~2^-8 relative rounding suggests):
    # measured max |gap| 3.95e-3 (bf16) / 4.46e-3 (int8), mean ~3.1e-4 /
    # 3.4e-4 — asserted with ~4x and ~3x headroom respectively
    np.testing.assert_allclose(np.asarray(x_f, np.float32),
                               np.asarray(x_u, np.float32), atol=1.5e-2)
    assert np.abs(np.asarray(x_f, np.float32)
                  - np.asarray(x_u, np.float32)).mean() < 1e-3


@pytest.mark.slow
def test_feature_fn_fused_mel_batch_one(monkeypatch):
    """b=1 edge of the software-pipelined mel epilogue: the grid is 2
    steps (synthesize at step 0, GEMM at the flush step only) — the
    revolving out-block index map must still land the single sample."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    rng = np.random.default_rng(15)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)],
        n_frame=64)
    cfg = Config(model_type='vad', v=8, n_mels=40, n_frame=64, n_chan=2,
                 batch_size=1)
    key = jax.random.PRNGKey(23)
    x_f, y_f = make_feature_fn(cfg, training=True,
                               use_pallas=True, fused_mel=True)(key, banks)
    x_u, y_u = make_feature_fn(cfg, training=True,
                               use_pallas=True, fused_mel=False)(key, banks)
    assert x_f.shape == x_u.shape == (1, 40, 64, 2)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_u))


@pytest.mark.slow
def test_sample_batch_pallas_se_targets_interpret(monkeypatch):
    """se_v9's seperate_noise_voice triple (reference: pipeline.py:104-108)
    through the Pallas kernel — per-source-group calls: only_noise zeroes
    every voice weight (the kernel's activity gate skips those clips),
    only_voice swaps in a one-item all-zero background bank (the
    reference accumulates voices from ZEROS, pipeline.py:37,82-83). Each
    output is a strict sub-mix of the full call, so all three must match
    the XLA gather/scatter formulation on the same key, both layouts."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows
    calls = []

    def interp(*args, **kw):
        calls.append(1)
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(13)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 3, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)],
        n_frame=64)
    key = jax.random.PRNGKey(31)
    for layout in ('ftc', 'tfc'):
        calls.clear()
        s_pl, (y_pl, ov_pl, on_pl) = sample_batch(
            key, banks, 4, 64, seperate_noise_voice=True,
            use_pallas=True, layout=layout)
        assert len(calls) == 3, 'one kernel call per source group'
        s_x, (y_x, ov_x, on_x) = sample_batch(
            key, banks, 4, 64, seperate_noise_voice=True,
            use_pallas=False, layout=layout)
        np.testing.assert_array_equal(np.asarray(y_pl), np.asarray(y_x))
        for a, b, what in ((s_pl, s_x, 'spec'), (ov_pl, ov_x, 'only_voice'),
                           (on_pl, on_x, 'only_noise')):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f'{what} ({layout})')
        # only_voice really is voices-only: zero wherever no label fires
        voiced = np.asarray(y_pl).sum(axis=(1, 3)) > 0          # [B, n]
        t_ax = 2 if layout == 'ftc' else 1
        ov_frames = np.abs(np.asarray(ov_pl)).max(
            axis=tuple(i for i in range(1, 4) if i != t_ax))    # [B, n]
        assert (ov_frames[~voiced] == 0).all()


@pytest.mark.slow
def test_sample_batch_pallas_se_targets_slim_int8_banks(monkeypatch):
    """The point of the se Pallas path: slim (data_resident=False)
    reduced-precision banks now serve the heaviest family too. int8 chain:
    labels stay bit-identical to the exact f32 XLA path, features track it
    to quantization tolerance, and the XLA path refuses the slim bank
    loudly."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(17)
    srcs = ([rng.standard_normal((257, 94, 4)).astype('f4')
             for _ in range(3)],
            [rng.standard_normal((257, 40, 4)).astype('f4')
             for _ in range(4)],
            rng.integers(0, 3, size=4),
            [rng.standard_normal((257, 20, 4)).astype('f4')
             for _ in range(3)])
    slim = build_banks(*srcs, n_frame=64, flat_dtype='int8',
                       data_resident=False)
    full = build_banks(*srcs, n_frame=64)
    assert slim.backgrounds.data is None
    key = jax.random.PRNGKey(5)
    s_q, (y_q, ov_q, on_q) = sample_batch(
        key, slim, 4, 64, seperate_noise_voice=True, use_pallas=True)
    s_x, (y_x, ov_x, on_x) = sample_batch(
        key, full, 4, 64, seperate_noise_voice=True, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_x))
    for a, b in ((s_q, s_x), (ov_q, ov_x), (on_q, on_x)):
        err = np.mean(np.abs(np.asarray(a, np.float32) - np.asarray(b)))
        scale = np.mean(np.abs(np.asarray(b))) + 1e-9
        assert err / scale < 2e-2, (err, scale)

    with pytest.raises(AssertionError, match='data_resident'):
        sample_batch(key, slim, 4, 64, seperate_noise_voice=True,
                     use_pallas=False)
