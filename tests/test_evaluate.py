"""Evaluation-path tests: event extraction, greedy ER (the 1.2 golden case
through get_er), OLA/windowing parity, and an end-to-end challenge eval on
synthesized wavs (the reference leaves evaluate() untested, SURVEY §4)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from _helpers import write_wav

from challenge_tpu.config import Config
from challenge_tpu.evaluate import (
    ChallengeMetric, evaluate, frame_signal, get_er, get_start_end_frame,
    get_start_end_time, output_to_metric, overlap_and_add, second2frame)
from challenge_tpu.models import get_model


# ------------------------------------------------------------------- events
def test_get_er_golden():
    """Same events as the reference's er_score golden test
    (metrics_test.py:9-10): greedy matching gives 1.2 exactly."""
    gt = np.array([[0, 0, 10], [2, 0, 20], [1, 15, 30], [2, 31, 40],
                   [1, 32, 35]])
    predict = np.array([[1, 5], [1, 19], [2, 32], [2, 38], [0, 38]])
    assert get_er(gt, predict) == pytest.approx(1.2)


def test_get_er_each_pred_used_once():
    gt = np.array([[0, 0, 10], [0, 5, 15]])
    predict = np.array([[0, 7]])          # inside both windows
    # one pred can only consume one gt event: N=3, matches=1 -> (3-2)/2
    assert get_er(gt, predict) == pytest.approx(0.5)


def test_get_start_end_frame_pairs_and_odd_fix():
    grid = np.zeros((10, 3))
    grid[2:5, 0] = 1          # event frames 2..4
    grid[8:, 1] = 1           # open run at the end -> odd count fix
    cls0, cls1, cls2 = get_start_end_frame(grid)
    np.testing.assert_array_equal(cls0, [[2, 4]])
    np.testing.assert_array_equal(cls1, [[8, 9]])
    assert len(cls2) == 0


def test_get_start_end_time_dedup():
    grid = np.zeros((200, 3))
    grid[0:3, 0] = 1
    grid[5:8, 0] = 1          # both events round to [0, 0] seconds
    times = get_start_end_time(grid)
    assert len(times[0]) == 1


def test_output_to_metric_midpoints():
    rows = output_to_metric(256, 16000)(
        np.array([[0, 124]]), np.zeros((0, 2)), np.array([[200, 300]]))
    # mid frame 62 -> 62*256/16000 = 0.99s -> int 0 ; mid 250 -> 4s
    np.testing.assert_array_equal(rows, [[0, 0], [2, 4]])


def test_second2frame_rasterizes():
    frames = second2frame([[1, 0.5, 1.0]], 100, 62.5)
    assert frames[31, 1] == 1 and frames[62, 1] == 0
    assert frames.sum() == pytest.approx(31)


# ------------------------------------------------- windowing / overlap-add
def test_frame_signal_matches_manual():
    x = jnp.arange(10.0).reshape(1, 10, 1)
    w = frame_signal(x, 4, 3, axis=-2)     # ceil(10/3)=4 windows
    assert w.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(w)[0, :, :, 0],
        [[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9], [9, 0, 0, 0]])


def test_overlap_and_add_counts():
    ones = jnp.ones((4, 4))
    out = overlap_and_add(ones, 2)          # length (4-1)*2+4 = 10
    np.testing.assert_array_equal(np.asarray(out),
                                  [1, 1, 2, 2, 2, 2, 2, 2, 1, 1])


def test_windowed_mean_roundtrip():
    """frame + OLA + count-normalize reproduces the original sequence."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 20, 1)).astype(np.float32))
    w = frame_signal(x, 8, 4, axis=-2)[0, :, :, 0]       # [W, 8]
    counts = overlap_and_add(jnp.ones_like(w), 4)
    summed = overlap_and_add(w, 4)
    recon = (summed / counts)[:20]
    np.testing.assert_allclose(recon, np.asarray(x)[0, :, 0], rtol=1e-5)


# ------------------------------------------------------------- end-to-end
def _write_wav(path, seconds=8.0, sr=16000, chans=2, seed=0):
    # 440 Hz tone on channel 0 gives the eval model some structure to find
    write_wav(path, seconds=seconds, sr=sr, chans=chans, seed=seed,
              tone_hz=440)


@pytest.mark.slow
def test_evaluate_sharded_matches_single(tmp_path):
    """Mesh-sharded window batches must give identical ER to single-device
    eval (long wav -> several windows split across the 8-device mesh)."""
    import jax
    from challenge_tpu.parallel import make_mesh, replicate
    _write_wav(tmp_path / 'clip.wav', seconds=40.0, seed=3)
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump({'task2_answer': {'clip': [[0, 1.0, 2.0],
                                             [1, 10.0, 12.0]]}}, f)
    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=512, n_chan=2)
    bundle = get_model(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    single = evaluate(cfg, bundle, variables, eval_dir=str(tmp_path))
    mesh = make_mesh(8)
    sharded = evaluate(cfg, bundle, replicate(variables, mesh),
                       eval_dir=str(tmp_path), mesh=mesh)
    assert single == sharded


def test_pcm_row_to_spec_matches_wav_to_spec(tmp_path):
    """The batched devset ingest must run the SAME chain as the per-clip
    wav_to_spec — including the same-rate Kaldi lowpass the reference
    applies to every clip (data_utils.py:20-21) — on a zero-filled row
    with a traced true length (regression: the batched path used to skip
    the resample entirely)."""
    import jax
    from challenge_tpu.evaluate.infer import (
        _pcm_row_to_spec, _prepare_batched_pcm)
    from challenge_tpu.ops.dsp import read_wav_raw, wav_to_spec

    p = str(tmp_path / 'clip.wav')
    write_wav(p, seconds=3.7, seed=5, tone_hz=440)
    raw, rate = read_wav_raw(p)
    ref = np.asarray(wav_to_spec(jnp.asarray(raw), rate))

    # pad the row well past the true length (a shorter sibling clip would)
    pcm, lens = _prepare_batched_pcm([p], s_max=raw.shape[1] + 16000)
    spec, n_valid = jax.jit(_pcm_row_to_spec)(
        jnp.asarray(pcm[0]), jnp.asarray(lens[0]))
    assert int(n_valid) == ref.shape[1]
    got = np.asarray(spec)[:, :int(n_valid)]
    assert got.shape == ref.shape
    # identical up to f32 reduction-order noise in the RMS over the
    # zero-filled row
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_evaluate_batched_devset_matches_per_clip(tmp_path):
    """The one-program devset path (single upload/dispatch/fetch over
    zero-filled PCM with validity masks) must produce bit-identical
    frame grids to the per-clip chain — including clips of DIFFERENT
    lengths, which stress the masked minmax/smoothing/zero-pad logic."""
    import jax
    from challenge_tpu.evaluate.infer import (
        _prepare_batched_pcm, make_devset_infer_fn, make_infer_fn)
    from challenge_tpu.ops.dsp import load_wav_device

    paths = []
    for i, seconds in enumerate((4.0, 6.5, 5.25)):
        p = tmp_path / f'clip{i}.wav'
        _write_wav(p, seconds=seconds, seed=10 + i)
        paths.append(str(p))

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=512, n_chan=2)
    bundle = get_model(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    pcm, lens = _prepare_batched_pcm(paths)
    grids = np.asarray(make_devset_infer_fn(bundle, cfg)(
        variables, jnp.asarray(pcm), jnp.asarray(lens)))

    infer = make_infer_fn(bundle, cfg)
    for i, p in enumerate(paths):
        ref = np.asarray(infer(variables, load_wav_device(p)))
        got = grids[i, :int(lens[i]) // 256 + 1]
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref, err_msg=p)
        # beyond the valid frames the batched grid must be all-zero
        np.testing.assert_array_equal(grids[i, int(lens[i]) // 256 + 1:], 0)

    # and the evaluate() entry must take the batched path transparently
    answers = {'task2_answer': {f'clip{i}': [[0, 1, 2]] for i in range(3)}}
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump(answers, f)
    batched = evaluate(cfg, bundle, variables, eval_dir=str(tmp_path))
    per_clip = evaluate(cfg, bundle, variables, eval_dir=str(tmp_path),
                        batched=False)
    assert batched == per_clip

    # mesh-sharded batched path: clip axis over the 8-device mesh (3 clips
    # padded to 8 with dummies) must give the same scores
    from challenge_tpu.parallel import make_mesh, replicate
    mesh = make_mesh(8)
    sharded = evaluate(cfg, bundle, replicate(variables, mesh),
                       eval_dir=str(tmp_path), mesh=mesh)
    assert sharded == per_clip


@pytest.mark.slow
def test_evaluate_chunked_matches_per_clip(tmp_path, monkeypatch):
    """Corpora beyond the one-program PCM budget evaluate as equal-shape
    chunks reusing ONE compiled program. Shrinking the budget so 5 clips
    split into 2-clip chunks (the last one padded) must give exactly the
    per-clip scores; the chunk-size program must be compiled once."""
    import jax
    import challenge_tpu.evaluate.infer as infer_mod

    paths = []
    for i, seconds in enumerate((4.0, 6.5, 5.25, 3.5, 6.0)):
        p = tmp_path / f'clip{i}.wav'
        _write_wav(p, seconds=seconds, seed=20 + i)
        paths.append(str(p))
    answers = {'task2_answer': {f'clip{i}': [[0, 1, 2]] for i in range(5)}}
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump(answers, f)

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=512, n_chan=2)
    bundle = get_model(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    per_clip = evaluate(cfg, bundle, variables, eval_dir=str(tmp_path),
                        batched=False)

    # budget of ~2 padded 6.5 s stereo clips -> chunks of 2/2/1(+pad)
    two_clips = 2 * 2 * (2 * 256 + int(6.5 * 16000)) * 2
    monkeypatch.setattr(infer_mod, '_BATCH_PCM_CAP_BYTES', two_clips)
    calls = []
    orig = infer_mod.make_devset_infer_fn

    def counting(*a, **kw):
        fn = orig(*a, **kw)

        def wrapped(variables, pcm, lens):
            calls.append(tuple(pcm.shape))
            return fn(variables, pcm, lens)
        return wrapped
    monkeypatch.setattr(infer_mod, 'make_devset_infer_fn', counting)

    chunked = infer_mod.evaluate(cfg, bundle, variables,
                                 eval_dir=str(tmp_path))
    assert chunked == per_clip
    # 3 chunks, every one the SAME shape (same compiled program)
    assert len(calls) == 3 and len(set(calls)) == 1, calls


@pytest.mark.slow
def test_evaluate_end_to_end(tmp_path):
    """Full challenge eval on two synthesized wavs with an untrained model:
    must produce finite per-clip ERs through the whole windowed chain."""
    for stem, seed in (('set01_drone01', 0), ('set01_drone02', 1)):
        _write_wav(tmp_path / f'{stem}.wav', seconds=8.0, seed=seed)
    answers = {'task2_answer': {
        'set01_drone01': [[0, 1.0, 2.0], [2, 4.0, 6.0]],
        'set01_drone02': [[1, 0.5, 3.0]],
    }}
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump(answers, f)

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=512, n_chan=2)
    bundle = get_model(cfg)
    import jax
    variables = bundle.init(jax.random.PRNGKey(0))
    scores = evaluate(cfg, bundle, variables, eval_dir=str(tmp_path))
    assert len(scores) == 2
    assert all(np.isfinite(s) for s in scores)
    # ER is (|gt|+|pred|-2m)/|gt| >= 0 always
    assert all(s >= 0 for s in scores)


def test_device_pcm_cache_is_lru_and_bypassable(tmp_path):
    """The device PCM cache keeps recently-HIT entries (LRU, not FIFO) and
    use_cache=False neither reads nor populates it."""
    import wave
    from challenge_tpu.evaluate import infer

    def wav(name):
        p = str(tmp_path / name)
        with wave.open(p, 'wb') as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(np.zeros((1600, 2), '<i2').tobytes())
        return p

    a, b, c = wav('a.wav'), wav('b.wav'), wav('c.wav')
    infer._DEVICE_PCM_CACHE.clear()
    try:
        infer._device_pcm([a], max_entries=2)
        infer._device_pcm([b], max_entries=2)
        infer._device_pcm([a], max_entries=2)   # hit -> moves to back
        infer._device_pcm([c], max_entries=2)   # evicts b, NOT a
        keys = [k[2][0] for k in infer._DEVICE_PCM_CACHE]
        assert keys == [a, c]
        infer._device_pcm([b], max_entries=2, use_cache=False)
        assert len(infer._DEVICE_PCM_CACHE) == 2   # bypass did not insert
    finally:
        infer._DEVICE_PCM_CACHE.clear()


@pytest.mark.slow
def test_eval_merge_keys_fresh_per_clip(tmp_path):
    """n_chan > 3 evaluation draws a fresh channel mix per clip like the
    reference (metrics.py:46 runs random_merge_aug inside the per-clip
    loop) — the key is the base key folded with the clip index, so clips
    differ while runs stay deterministic."""
    import jax
    import challenge_tpu.evaluate.infer as infer_mod
    from challenge_tpu.evaluate.infer import _make_spec_to_grid

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=512, n_chan=6)
    bundle = get_model(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    seen = []
    real = infer_mod.random_merge_aug

    def spy(n_chan):
        f = real(n_chan)

        def g(key, spec):
            seen.append(np.asarray(key))
            return f(key, spec)
        return g

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((257, 700, 4)).astype('f4'))
    stg = _make_spec_to_grid(bundle, cfg, 512, None)
    old = infer_mod.random_merge_aug
    infer_mod.random_merge_aug = spy
    try:
        # eager (unjitted) calls so the spy sees concrete keys
        g0 = stg(variables, spec, clip_seed=jnp.int32(0))
        g1 = stg(variables, spec, clip_seed=jnp.int32(1))
        g0b = stg(variables, spec, clip_seed=jnp.int32(0))
    finally:
        infer_mod.random_merge_aug = old

    assert len(seen) == 3
    k0, k1, k0b = seen
    assert not np.array_equal(k0, k1), 'clips must draw distinct mix keys'
    assert np.array_equal(k0, k0b), 'same clip index -> same key'
    expect0 = np.asarray(jax.random.fold_in(jax.random.PRNGKey(0), 0))
    assert np.array_equal(k0, expect0)
    # determinism end to end for the same clip index
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g0b))


@pytest.mark.slow
def test_evaluate_nchan6_batched_matches_per_clip(tmp_path):
    """The batched devset path threads the SAME global per-clip merge
    seeds as the per-clip chain, so n_chan > 3 grids stay bit-identical
    between the two paths."""
    import jax
    from challenge_tpu.evaluate.infer import (
        _prepare_batched_pcm, make_devset_infer_fn, make_infer_fn)
    from challenge_tpu.ops.dsp import load_wav_device

    paths = []
    for i in range(3):
        p = tmp_path / f'clip{i}.wav'
        _write_wav(p, seconds=4.0 + i, seed=20 + i)
        paths.append(str(p))

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=512, n_chan=6)
    bundle = get_model(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    pcm, lens = _prepare_batched_pcm(paths)
    seeds = jnp.arange(len(paths), dtype=jnp.int32)
    grids = np.asarray(make_devset_infer_fn(bundle, cfg)(
        variables, jnp.asarray(pcm), jnp.asarray(lens), seeds))

    infer = make_infer_fn(bundle, cfg)
    for i, p in enumerate(paths):
        ref = np.asarray(infer(variables, load_wav_device(p), np.int32(i)))
        got = grids[i, :int(lens[i]) // 256 + 1]
        np.testing.assert_array_equal(got, ref)
