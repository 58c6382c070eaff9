"""Training-machinery tests: the reference's golden er_score test
(metrics_test.py:8-25) plus coverage for losses, AGC, optimizers, SWA and a
small end-to-end training smoke (reference leaves these untested, SURVEY §4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from challenge_tpu.config import Config
from challenge_tpu.models import get_model
from challenge_tpu.train import (
    CSVLogger, EarlyStopping, LearningRateScheduler, ModelCheckpoint,
    NO_SWA_ERROR, SWA, TerminateOnNaN, TrainLoop, adaptive_clip_grad,
    binary_crossentropy, cos_sim, custom_scheduler, er_score, f1_counts,
    f1_from_counts, init_state, load_weights, make_optimizer, save_weights,
    scale_by_adabelief, set_learning_rate, sigmoid_focal_crossentropy,
    unitwise_norm,
)


# --------------------------------------------------------------- er golden
def test_er_score_golden():
    """The reference's single most important parity test
    (metrics_test.py:23-25): mean ER == 1.2 exactly."""
    gt = np.array([[0, 0, 10], [2, 0, 20], [1, 15, 30], [2, 31, 40],
                   [1, 32, 35]])
    predict = np.array([[1, 5], [1, 19], [2, 32], [2, 38], [0, 38]])
    gt_array = np.zeros([2, 40, 3])
    pred_array = np.zeros([2, 40, 3])
    for c, s, e in gt:
        gt_array[:, s:e, c] = 1
    for c, m in predict:
        pred_array[:, m - 2:m + 2, c] = 1
    er = er_score(smoothing=False)(jnp.asarray(gt_array),
                                   jnp.asarray(pred_array))
    assert float(jnp.mean(er)) == pytest.approx(1.2)


def test_er_score_perfect_prediction():
    y = np.zeros([1, 64, 3])
    y[0, 10:20, 0] = 1
    y[0, 40:50, 2] = 1
    er = er_score(smoothing=False)(jnp.asarray(y), jnp.asarray(y))
    assert float(jnp.mean(er)) == 0.0


def test_er_score_no_events_in_truth():
    y_true = np.zeros([1, 64, 3])
    y_pred = np.zeros([1, 64, 3])
    y_pred[0, 4:9, 1] = 1
    er = er_score(smoothing=False)(jnp.asarray(y_true), jnp.asarray(y_pred))
    assert float(jnp.mean(er)) == 1.0   # n_pred / max(n_true, 1)


def test_er_score_event_at_boundary():
    # runs touching t=0 and t=T-1 must count one start and one end each
    y = np.zeros([1, 32, 3])
    y[0, :5, 0] = 1
    y[0, 28:, 1] = 1
    er = er_score(smoothing=False)(jnp.asarray(y), jnp.asarray(y))
    assert float(jnp.mean(er)) == 0.0


# ------------------------------------------------------------------ losses
def test_bce_matches_manual():
    rng = np.random.default_rng(0)
    y = (rng.uniform(size=(4, 8, 3)) > 0.5).astype(np.float32)
    p = rng.uniform(0.01, 0.99, size=(4, 8, 3)).astype(np.float32)
    expected = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    got = float(binary_crossentropy(jnp.asarray(y), jnp.asarray(p)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_focal_less_than_bce_on_easy_examples():
    y = jnp.ones((2, 8, 3))
    p = jnp.full((2, 8, 3), 0.95)
    focal = float(sigmoid_focal_crossentropy(y, p))
    # well-classified examples are strongly down-weighted
    assert focal < float(binary_crossentropy(y, p))


def test_cos_sim_identical_is_minus_one():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.uniform(size=(2, 16, 3)).astype(np.float32))
    v = cos_sim(y, y)
    np.testing.assert_allclose(np.asarray(v), -1.0, atol=1e-5)


def test_f1_counts_and_finish():
    y = jnp.asarray([[[1., 0., 1.], [0., 0., 1.]]])
    p = jnp.asarray([[[.9, .8, .2], [.1, .2, .9]]])
    tp, fp, fn = np.asarray(f1_counts(y, p))
    assert (tp, fp, fn) == (2, 1, 1)
    assert float(f1_from_counts(jnp.asarray([tp, fp, fn]))) == \
        pytest.approx(2 * 2 / (2 * 2 + 1 + 1))


# ----------------------------------------------------------------- AGC/opt
def test_unitwise_norm_shapes():
    assert unitwise_norm(jnp.ones((5,))).shape == ()
    assert unitwise_norm(jnp.ones((4, 6))).shape == (1, 6)
    assert unitwise_norm(jnp.ones((3, 3, 2, 8))).shape == (1, 1, 1, 8)
    with pytest.raises(ValueError):
        unitwise_norm(jnp.ones((2, 2, 2, 2, 2)))


def test_agc_clips_large_gradients():
    params = {'w': jnp.full((4, 4), 1.0)}
    small = {'w': jnp.full((4, 4), 1e-4)}
    large = {'w': jnp.full((4, 4), 10.0)}
    out_small = adaptive_clip_grad(params, small)['w']
    out_large = adaptive_clip_grad(params, large)['w']
    np.testing.assert_allclose(out_small, small['w'])       # untouched
    # clipped to clip_factor * ||w|| ratio
    p_norm = float(unitwise_norm(params['w'])[0, 0])
    g_norm = float(unitwise_norm(large['w'])[0, 0])
    expected = 10.0 * (0.01 * p_norm / g_norm)
    np.testing.assert_allclose(out_large, expected, rtol=1e-5)


def test_adabelief_step_differs_from_adam():
    import optax
    params = {'w': jnp.asarray([1.0, -2.0, 3.0])}
    grads = {'w': jnp.asarray([0.1, 0.2, -0.1])}
    ab = scale_by_adabelief()
    ab_state = ab.init(params)
    ab_up, _ = ab.update(grads, ab_state)
    ad = optax.scale_by_adam(eps=1e-7)
    ad_state = ad.init(params)
    ad_up, _ = ad.update(grads, ad_state)
    assert not np.allclose(np.asarray(ab_up['w']), np.asarray(ad_up['w']))
    # AdaBelief first step: v = (1-b2)(g-m1)^2 with m1=(1-b1)g
    # update = sqrt(1-b2)/(1-b1) * m1/(sqrt(v)+eps)
    g = 0.1
    m1 = 0.1 * g
    v1 = 0.001 * (g - m1) ** 2
    exp = (np.sqrt(1 - 0.999) / (1 - 0.9)) * m1 / (np.sqrt(v1) + 1e-7)
    assert float(ab_up['w'][0]) == pytest.approx(exp, rel=1e-4)


def test_scheduler_warmup_shape():
    sched = custom_scheduler(4096, warmup_steps=25, lr_div=2)
    lrs = [sched(e) for e in range(100)]
    peak = int(np.argmax(lrs))
    assert 20 <= peak <= 30            # warmup peaks near warmup_steps
    assert lrs[99] < lrs[peak]


def test_optimizer_lr_injection():
    cfg = Config(optimizer='adam', lr=1e-3, clipvalue=0.01)
    opt = make_optimizer(cfg)
    params = {'w': jnp.zeros((3,))}
    st = opt.init(params)
    assert float(st.hyperparams['learning_rate']) == pytest.approx(1e-3)
    st = set_learning_rate(st, 5e-4)
    up, st2 = opt.update({'w': jnp.full((3,), 100.0)}, st, params)
    # clipvalue caps |g| at 0.01 before adam; after adam+lr the step is ~lr
    assert abs(float(up['w'][0])) <= 5.1e-4


def test_density_metrics_cos_sim_only():
    """The density trainer family (v=0, set by cli/trainer.py) compiles
    cos_sim ONLY (reference: trainer.py:252-253); er/f1 would threshold
    soft 30-dim count-density targets at 0.5."""
    from challenge_tpu.train import batch_metrics
    assert set(batch_metrics(Config(model_type='eff', v=0))) == {'cos_sim'}
    assert set(batch_metrics(Config(model_type='vad', v=8))) == \
        {'cos_sim', 'f1_counts', 'er'}
    # v == 5 drops er but keeps f1 (reference: sj_train.py:456-457)
    assert set(batch_metrics(Config(model_type='eff', v=5))) == \
        {'cos_sim', 'f1_counts'}


def test_csv_logger_append_false_keeps_all_epochs(tmp_path):
    """Keras CSVLogger(append=False) truncates ONCE at run start, then
    appends — every epoch of the current run survives."""
    import csv as csv_mod
    p = str(tmp_path / 'log.csv')
    cb = CSVLogger(p, append=False)
    for e in range(3):
        cb.on_epoch_end(e, {'loss': float(e)})
    with open(p) as f:
        rows = list(csv_mod.reader(f))
    assert rows[0] == ['epoch', 'loss']
    assert [r[0] for r in rows[1:]] == ['0', '1', '2']

    # a second append=False run truncates the previous run's rows once
    cb2 = CSVLogger(p, append=False)
    cb2.on_epoch_end(0, {'loss': 9.0})
    with open(p) as f:
        rows = list(csv_mod.reader(f))
    assert [r[0] for r in rows] == ['epoch', '0']

    # append=True keeps prior content and skips the duplicate header
    cb3 = CSVLogger(p, append=True)
    cb3.on_epoch_end(1, {'loss': 10.0})
    with open(p) as f:
        rows = list(csv_mod.reader(f))
    assert [r[0] for r in rows] == ['epoch', '0', '1']

    # reusing ONE append=False logger across two runs truncates per RUN
    # (fit() fires on_train_begin), like Keras' CSVLogger
    cb2.on_train_begin()
    cb2.on_epoch_end(0, {'loss': 11.0})
    with open(p) as f:
        rows = list(csv_mod.reader(f))
    assert [r[0] for r in rows] == ['epoch', '0']


# --------------------------------------------------------- end-to-end smoke
def _tiny_banks(n_frame):
    from challenge_tpu.data.pipeline import build_banks
    rng = np.random.default_rng(0)
    bgs = [rng.standard_normal((257, n_frame + 30, 4)).astype(np.float32)
           for _ in range(3)]
    voices = [rng.standard_normal((257, 40, 4)).astype(np.float32)
              for _ in range(4)]
    labels = rng.integers(0, 3, size=4)
    noises = [rng.standard_normal((257, 20, 4)).astype(np.float32)
              for _ in range(3)]
    return build_banks(bgs, voices, labels, noises)


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path, monkeypatch):
    """Full slice: on-device synthesis -> features -> vad model -> AGC ->
    adam -> SWA -> checkpoints, 2 epochs x 2 steps on tiny shapes."""
    from challenge_tpu.data.pipeline import DevicePipeline
    monkeypatch.chdir(tmp_path)
    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=64, n_chan=2,
                 batch_size=2, epochs=2, steps_per_epoch=2)
    banks = _tiny_banks(cfg.n_frame)
    train_pipe = DevicePipeline(banks, cfg, training=True)
    val_pipe = DevicePipeline(banks, cfg, training=False)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, seed=0)
    name = cfg.run_name() + '.h5'
    callbacks = [
        CSVLogger(name.replace('.h5', '.csv')),
        SWA(start_epoch=1, swa_freq=1),
        ModelCheckpoint(name, monitor='val_er', mode='min'),
        TerminateOnNaN(),
        EarlyStopping(monitor='val_loss', patience=10),
        LearningRateScheduler(custom_scheduler(4096, cfg.epochs / 12, 2.)),
    ]
    hist = loop.fit(train_pipe, epochs=cfg.epochs,
                    steps_per_epoch=cfg.steps_per_epoch,
                    validation_iter=val_pipe, validation_steps=2,
                    callbacks=callbacks)
    assert len(hist) == 2
    for key in ('loss', 'er', 'cos_sim', 'f1_score', 'val_loss', 'val_er'):
        assert key in hist[0], hist[0].keys()
    assert np.isfinite(hist[-1]['loss'])
    assert os.path.exists(name)                      # best checkpoint
    assert os.path.exists(name.replace('.h5', '.csv'))
    assert int(loop.state.swa_count) >= 1            # SWA triggered
    # checkpoint roundtrip
    restored = load_weights(name, loop.state.weights())
    leaves_a = jax.tree.leaves(restored)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves_a)


@pytest.mark.slow
def test_train_loop_fused_mode(tmp_path, monkeypatch):
    """Banks mode: one XLA program per dispatch (steps_per_call scanned),
    validation over val_banks, callbacks and checkpoints identical."""
    monkeypatch.chdir(tmp_path)
    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=64, n_chan=2,
                 batch_size=2, steps_per_call=2)
    banks = _tiny_banks(cfg.n_frame)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, seed=0, banks=banks, val_banks=banks)
    name = cfg.run_name() + '.h5'
    hist = loop.fit(epochs=2, steps_per_epoch=4, validation_steps=2,
                    callbacks=[SWA(start_epoch=1, swa_freq=1),
                               ModelCheckpoint(name, monitor='val_er'),
                               EarlyStopping(monitor='val_loss', patience=9)])
    assert len(hist) == 2
    assert int(loop.state.step) == 8          # 2 epochs x 4 steps
    for key in ('loss', 'er', 'val_loss', 'val_er', 'f1_score'):
        assert key in hist[0]
    assert np.isfinite(hist[-1]['loss'])
    assert os.path.exists(name)


@pytest.mark.slow
def test_remat_train_step_matches_exact():
    """Config.remat=True (jax.checkpoint full rematerialization) must be a
    pure memory/FLOPs trade: the updated params and metrics after one step
    are numerically identical to the non-remat step."""
    from challenge_tpu.train import make_train_step

    rng = np.random.default_rng(11)
    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=64, n_chan=2,
                 batch_size=2)
    x = jnp.asarray(rng.standard_normal((2, 80, 64, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=(2, 2, 3)), jnp.float32)

    outs = []
    for remat in (False, True):
        bundle = get_model(cfg.replace(remat=remat))
        step, opt = make_train_step(bundle)
        state = init_state(bundle, jax.random.PRNGKey(0), opt)
        new_state, metrics = step(state, (x, y), jax.random.PRNGKey(1))
        outs.append((new_state.params, metrics))
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_training_actually_learns():
    """Convergence proof (overfit-one-batch): a feature batch synthesized
    from strongly separable data (each class a distinct spectral band, quiet
    backgrounds) must be driven to near-zero BCE in 60 optimizer steps —
    guarding the model -> grad -> AGC -> optimizer chain against silent
    breakage (wrong gradients, dead layers, broken clipping) that the
    finiteness smoke tests above cannot catch. Calibrated: loss goes
    0.66 -> ~0.004 by step 50 on this seed."""
    from challenge_tpu.data.pipeline import build_banks, make_feature_fn
    from challenge_tpu.train import make_train_step

    rng = np.random.default_rng(3)
    n_frame = 64
    bands = ((20, 60), (110, 150), (200, 240))

    def voice(cls):
        t = int(rng.integers(30, 50))
        s = rng.standard_normal((257, t, 4)).astype(np.float32) * 0.05
        lo, hi = bands[cls]
        s[lo:hi] += np.sign(rng.standard_normal((hi - lo, t, 4))) * 2.0
        return s

    classes = np.asarray([0, 1, 2] * 4)
    # one-hot 2D labels skip the reference's 30-class //10 remap quirk
    banks = build_banks(
        [rng.standard_normal((257, n_frame + 30, 4)).astype(np.float32) * 0.05
         for _ in range(3)],
        [voice(c) for c in classes],
        np.eye(3, dtype=np.float32)[classes])

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=n_frame, n_chan=2,
                 batch_size=8, lr=3e-3)
    bundle = get_model(cfg)
    batch = make_feature_fn(cfg, training=True)(jax.random.PRNGKey(5), banks)
    step, opt = make_train_step(bundle)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    losses = []
    for _ in range(60):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m['loss']))
    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < 0.05, (losses[0], losses[-1])
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_training_learns_from_int8_banks(monkeypatch):
    """The int8-bank accuracy story, training half: a batch synthesized
    from int8-quantized banks (per-item max-abs, dequant folded into the
    mix — mean |feature err| ~7e-3 vs f32, measured on v5e) must drive the
    same overfit-one-batch setup to near-zero BCE — quantization noise is
    far below the training signal. Forces the Pallas interpret path (the
    only consumer of the quantized flat layout)."""
    import challenge_tpu.ops.pallas_synth as ps
    from challenge_tpu.data.pipeline import build_banks, make_feature_fn
    from challenge_tpu.train import make_train_step

    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(3)
    n_frame = 64
    bands = ((20, 60), (110, 150), (200, 240))

    def voice(cls):
        t = int(rng.integers(30, 50))
        s = rng.standard_normal((257, t, 4)).astype(np.float32) * 0.05
        lo, hi = bands[cls]
        s[lo:hi] += np.sign(rng.standard_normal((hi - lo, t, 4))) * 2.0
        return s

    classes = np.asarray([0, 1, 2] * 4)
    banks = build_banks(
        [rng.standard_normal((257, n_frame + 30, 4)).astype(np.float32) * 0.05
         for _ in range(3)],
        [voice(c) for c in classes],
        np.eye(3, dtype=np.float32)[classes],
        n_frame=n_frame, flat_dtype='int8', data_resident=False)

    cfg = Config(model_type='vad', v=3, n_mels=80, n_frame=n_frame, n_chan=2,
                 batch_size=8, lr=3e-3)
    bundle = get_model(cfg)
    batch = make_feature_fn(cfg, training=True, use_pallas=True)(
        jax.random.PRNGKey(5), banks)
    assert banks.voices.flat.dtype == jnp.int8     # the quantized path ran
    step, opt = make_train_step(bundle)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    losses = []
    for _ in range(60):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m['loss']))
    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < 0.05, (losses[0], losses[-1])
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])


def _trained_er_corpus(tmp_path, n_frame=128):
    """Shared fixture-builder for the trained-ER tests: numpy training
    sources (bgs, voices, one-hot labels) plus a 3-clip dev corpus written
    into ``tmp_path`` (wavs + sample_answer.json).

    The synthetic corpus encodes the domain lessons the TPU-scale run in
    scripts/trained_er_demo.py measured: classes are disjoint harmonic
    bands; dev event RMS matches the training mixture's v_ratio range
    (louder events are OOD and score WORSE); dev events are dense
    round-robin so every eval window contains every class — the eval chain
    normalizes per mel ROW (reference quirk, metrics.py:53) while training
    normalizes per window, so a class absent from a whole window gets its
    rows minmax-stretched to full scale and hallucinated."""
    import json
    import sys
    import wave

    # the harmonic-event/noise generators are shared with the TPU-scale
    # demo so the two "sibling" corpora cannot drift apart
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    from trained_er_demo import HOP, SR
    from trained_er_demo import event_wav as _event_wav
    from trained_er_demo import noise_wav as _noise_wav

    rng = np.random.default_rng(0)

    def event_wav(cls, dur_s, amp):
        return _event_wav(rng, cls, dur_s, amp=amp)

    def noise_wav(dur_s, amp=0.05):
        return _noise_wav(rng, dur_s, amp=amp)

    def spec_of(wav, n_fft=512, hop=HOP):
        # numpy ingest stand-in for the TRAINING banks (the eval side runs
        # the real wav_to_spec): skips only the near-identity equal-rate
        # lowpass, avoiding one jit compile per distinct clip length
        w = wav / (np.sqrt(np.mean(wav ** 2)) * 10.0)
        x = np.pad(w, ((0, 0), (n_fft // 2, n_fft // 2)), mode='reflect')
        T = (x.shape[1] - n_fft) // hop + 1
        idx = np.arange(n_fft)[None, :] + hop * np.arange(T)[:, None]
        win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
        F = np.fft.rfft(x[:, idx] * win, axis=-1)
        spec = np.transpose(np.stack([F.real, F.imag]), (3, 2, 0, 1))
        return spec.reshape(spec.shape[0], spec.shape[1], -1).astype('f4')

    # events must be >= 0.75 s: training labels are avg-pooled x32 then
    # thresholded at 0.5 (data/labels.py label_downsample), so a 0.25-0.5 s
    # event (16-32 frames) split across two 32-frame cells can produce ZERO
    # positive labels — measured: every recipe with short events stayed in
    # the all-zero optimum (f1 == 0 for 250+ steps); 0.75-1.0 s events
    # learn within ~150 steps
    voices, ids = [], []
    for cls in range(3):
        for _ in range(10):
            dur = (0.75, 1.0)[int(rng.integers(0, 2))]
            voices.append(spec_of(event_wav(cls, dur, amp=0.25)))
            ids.append(cls)
    bgs = [spec_of(noise_wav((n_frame + 32) * HOP / SR)) for _ in range(3)]
    onehot = np.eye(3, dtype=np.float32)[np.asarray(ids)]

    answer = {}
    for i in range(3):
        stem, clip_s = f'clip{i:02d}', 8.0
        bg = noise_wav(clip_s)
        events = []
        for cls in range(3):      # class c fires every ~1.9 s, so every
            tcur = 0.2 + cls * 0.6    # ~2 s window contains every class
            while True:
                dur = (0.75, 1.0)[int(rng.integers(0, 2))]
                if tcur + dur > clip_s - 0.2:
                    break
                # amp 0.02 -> event RMS ~1.2x the background's: inside the
                # snr=-2 training mixture's v_ratio range (louder is OOD)
                ev = event_wav(cls, dur, amp=0.02)
                s0 = int(tcur * SR)
                bg[:, s0:s0 + ev.shape[1]] += ev
                events.append([cls, round(tcur, 3), round(tcur + dur, 3)])
                tcur += dur + float(rng.uniform(0.9, 1.2))
        pcm = (np.clip(bg, -1, 1) * 32767).astype('<i2')
        with wave.open(str(tmp_path / f'{stem}.wav'), 'wb') as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(SR)
            f.writeframes(pcm.T.tobytes())
        answer[stem] = events
    with open(tmp_path / 'sample_answer.json', 'w') as f:
        json.dump({'task2_answer': answer}, f)
    return bgs, voices, onehot


@pytest.mark.slow
def test_trained_er_improves(tmp_path, monkeypatch):
    """The end-to-end quality demonstration no unit differential composes
    up to: real training makes the CHALLENGE ER improve on a synthesized
    dev set, scored through the same evaluate() chain the eval CLI uses
    (reference behavior matched: the metrics.py:31-90 score after a
    sj_train.py:513 fit). Scaled-down sibling of the full-shape TPU run in
    scripts/trained_er_demo.py (results in NOTES.md); corpus and domain
    lessons in _trained_er_corpus."""
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.evaluate import evaluate
    from challenge_tpu.train import TrainLoop

    n_frame = 128
    bgs, voices, onehot = _trained_er_corpus(tmp_path, n_frame=n_frame)
    banks = build_banks(bgs, voices, onehot, n_frame=n_frame)

    # vad v3 (lighter than v8, same family/downsample semantics; v1 is
    # untrainable by reference quirk) and steps_per_call=1: the scanned
    # multi-step fused program at these shapes takes the CPU XLA backend
    # >10 min to compile (measured). max_voices=3 keeps windows readable.
    cfg = Config(model_type='vad', v=3, n_mels=40, n_frame=n_frame,
                 n_chan=2, batch_size=8, snr=-2, max_voices=3, lr=1e-3)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, banks=banks, val_banks=banks, seed=0)
    var0 = {'params': loop.state.params,
            'batch_stats': loop.state.batch_stats}
    er0 = evaluate(cfg, bundle, var0, overlap_hop=32,
                   eval_dir=str(tmp_path))
    # FINAL weights, deliberately: best-by-val selection at this scale is
    # a trap, measured twice — with validation_steps=1 the per-epoch val
    # metrics are single-batch noise, so a best-val_er ModelCheckpoint
    # picks an early lucky epoch whose model still predicts-everything on
    # the dev set (its ER came back EXACTLY equal to the untrained
    # model's), and SWA without BN re-estimation (the preserved quirk)
    # averages the oscillating weights into a ~0.5-output model. The
    # final-epoch weights scored 0.884 across repeated calibrations.
    hist = loop.fit(epochs=14, steps_per_epoch=25, validation_steps=1,
                    verbose=0)
    # the train chain genuinely learned the task (not just moved)
    assert hist[-1]['f1_score'] > 0.4, hist[-1]
    assert hist[-1]['loss'] < 0.6 * hist[0]['loss'], (hist[0], hist[-1])
    var1 = {'params': loop.state.params,
            'batch_stats': loop.state.batch_stats}
    er1 = evaluate(cfg, bundle, var1, overlap_hop=32,
                   eval_dir=str(tmp_path))
    assert np.isfinite(er1).all() and np.isfinite(er0).all(), (er0, er1)
    # the challenge score improves: mean dev ER drops materially (measured
    # 0.972 -> 0.884 across repeated calibrations; the residual gap vs the
    # near-zero training-window ER is the eval chain's per-mel-row minmax
    # quirk at these 2 s windows — see the TPU-scale run in NOTES.md where
    # the same recipe reaches 0.51) and no clip gets worse
    assert float(np.mean(er1)) < float(np.mean(er0)) - 0.05, (er0, er1)
    assert sum(b < a for a, b in zip(er0, er1)) >= 2, (er0, er1)
    assert all(b <= a + 1e-9 for a, b in zip(er0, er1)), (er0, er1)

    # and the saved checkpoint reproduces the score exactly when reloaded
    # (the eval CLI itself is pinned at the reference's full-scale
    # overlap_hop=512 — which cannot cover these scaled-down 128-frame
    # windows — and is exercised end-to-end by test_cli and the TPU-scale
    # run in scripts/trained_er_demo.py)
    monkeypatch.chdir(tmp_path)
    save_weights('trained.h5', loop.state.weights(), bundle=bundle)
    reloaded = load_weights('trained.h5',
                            bundle.init(jax.random.PRNGKey(3)),
                            bundle=bundle)
    er2 = evaluate(cfg, bundle, reloaded, overlap_hop=32,
                   eval_dir=str(tmp_path))
    assert er2 == er1, (er2, er1)


@pytest.mark.slow
def test_trained_er_int8_slim_matches_f32(tmp_path, monkeypatch):
    """The int8-bank accuracy story at the CHALLENGE-ER level (the score
    the framework exists for): training from int8-quantized slim banks
    (per-item max-abs quantization + no dense f32 volume — the 6.4x HBM
    capacity configuration, NOTES.md) must reach the same trained dev ER
    as training from exact f32 banks. The two runs share the corpus, the
    loop seed and the RNG stream (Pallas/XLA parity is pinned bit-exact
    for f32), so the ONLY difference is the ~7e-3 feature quantization
    noise — far below the training signal, as the overfit-level sibling
    (test_training_learns_from_int8_banks) shows for the loss and this
    test pins for the official score. Forces the Pallas interpret path —
    the only consumer of the quantized flat layout (on TPU the CLIs pick
    it automatically; cli/sj_train.py slim gating)."""
    import challenge_tpu.ops.pallas_synth as ps
    import challenge_tpu.parallel.train as ptrain
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.evaluate import evaluate
    from challenge_tpu.train import TrainLoop

    n_frame = 128
    bgs, voices, onehot = _trained_er_corpus(tmp_path, n_frame=n_frame)
    cfg = Config(model_type='vad', v=3, n_mels=40, n_frame=n_frame,
                 n_chan=2, batch_size=8, snr=-2, max_voices=3, lr=1e-3)

    def train_and_score(banks, use_pallas):
        if use_pallas:                 # interpret-mode kernel on the CPU
            orig_synth = ps.synthesize_windows
            monkeypatch.setattr(
                ps, 'synthesize_windows',
                lambda *a, **kw: orig_synth(*a, **{**kw, 'interpret': True}))
            orig_ff = ptrain.make_feature_fn
            monkeypatch.setattr(
                ptrain, 'make_feature_fn',
                lambda *a, **kw: orig_ff(*a, **{**kw, 'use_pallas': True}))
        bundle = get_model(cfg)
        loop = TrainLoop(bundle, banks=banks, val_banks=banks, seed=0)
        hist = loop.fit(epochs=14, steps_per_epoch=25, validation_steps=1,
                        verbose=0)
        monkeypatch.undo()
        var = {'params': loop.state.params,
               'batch_stats': loop.state.batch_stats}
        return hist, evaluate(cfg, bundle, var, overlap_hop=32,
                              eval_dir=str(tmp_path))

    banks32 = build_banks(bgs, voices, onehot, n_frame=n_frame)
    banks_q = build_banks(bgs, voices, onehot, n_frame=n_frame,
                          flat_dtype='int8', data_resident=False)
    assert banks_q.voices.flat.dtype == jnp.int8   # quantized path engaged
    assert banks_q.voices.data is None             # slim: dense volume gone

    hist32, er32 = train_and_score(banks32, use_pallas=False)
    hist_q, er_q = train_and_score(banks_q, use_pallas=True)

    # both runs genuinely learned (same bars as the f32 sibling)
    for hist in (hist32, hist_q):
        assert hist[-1]['f1_score'] > 0.4, hist[-1]
        assert hist[-1]['loss'] < 0.6 * hist[0]['loss'], (hist[0], hist[-1])
    assert np.isfinite(er32).all() and np.isfinite(er_q).all(), (er32, er_q)
    print('trained ER f32:', er32, 'int8+slim:', er_q)
    # the official score from quantized banks matches the exact-bank run
    # within one dev-set ER quantum (~0.09 = one merged event on these
    # 3 clips); measured at calibration the per-clip ERs were IDENTICAL
    # ([1.0, 0.818, 0.833] both runs) — the tolerance absorbs quantization
    # flipping a borderline event, not a systematic gap
    assert abs(float(np.mean(er_q)) - float(np.mean(er32))) <= 0.09, \
        (er32, er_q)
    for a, b in zip(er32, er_q):
        assert abs(a - b) <= 0.15, (er32, er_q)


@pytest.mark.slow
def test_density_training_actually_learns():
    """Convergence proof for the DENSITY path — the trainer.py variant the
    BCE overfit test does not cover: count+TV loss (train/losses.py:66) +
    AdaBelief + the EfficientNet regression head (reference:
    trainer.py:144-189,246). Overfit one synthesized density batch of
    strongly separable voices; the count+TV loss must drop materially."""
    from challenge_tpu.data.pipeline import build_banks, make_feature_fn
    from challenge_tpu.models import get_density_model
    from challenge_tpu.train import make_train_step
    from challenge_tpu.train.losses import density_loss

    rng = np.random.default_rng(3)
    n_frame = 64
    bands = ((20, 60), (110, 150), (200, 240))

    def voice(cls):
        t = int(rng.integers(30, 50))
        s = rng.standard_normal((257, t, 4)).astype(np.float32) * 0.05
        lo, hi = bands[cls]
        s[lo:hi] += np.sign(rng.standard_normal((hi - lo, t, 4))) * 2.0
        return s

    groups = np.asarray([0, 1, 2] * 4)
    ids = groups * 10 + 5      # 30-dim density ids: class c, degree 5
    banks = build_banks(
        [rng.standard_normal((257, n_frame + 30, 4)).astype(np.float32) * .05
         for _ in range(3)],
        [voice(c) for c in groups],
        # already-one-hot 30-wide labels skip the //10 remap quirk
        np.eye(30, dtype=np.float32)[ids])

    cfg = Config(model_type='eff', v=0, model='EfficientNetB0', n_mels=80,
                 n_frame=n_frame, n_chan=2, batch_size=4, n_classes=30,
                 optimizer='adabelief', lr=3e-3)
    bundle = get_density_model(cfg)
    batch = make_feature_fn(cfg, training=True, variant='density')(
        jax.random.PRNGKey(5), banks)
    base = density_loss(alpha=0.8, l2=1.0)   # reference trainer defaults
    step, opt = make_train_step(bundle,
                                loss_fn=lambda t, p: (base(t, p), {}))
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    losses = []
    for _ in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m['loss']))
    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_fused_loop_threads_custom_loss():
    """TrainLoop(banks=...) fused mode must respect a custom loss_fn (the
    density trainer's count+TV path) instead of silently falling back to
    get_loss(config) — regression test for the fused/loss_fn gap."""
    from challenge_tpu.train import TrainLoop

    cfg = Config(model_type='vad', v=3, n_frame=64, n_chan=2, batch_size=2)
    banks = _tiny_banks(cfg.n_frame)
    bundle = get_model(cfg)

    def loss_fn(y, p):
        # recognizable constant + a grad-carrying term
        return jnp.float32(42.0) + 0.0 * jnp.sum(p), {}

    loop = TrainLoop(bundle, seed=0, banks=banks, val_banks=banks,
                     loss_fn=loss_fn)
    hist = loop.fit(epochs=1, steps_per_epoch=1, validation_steps=1)
    assert abs(hist[0]['loss'] - 42.0) < 1e-4
    assert abs(hist[0]['val_loss'] - 42.0) < 1e-4


@pytest.mark.slow
def test_se_v9_two_phase_training():
    """SE cascade end-to-end: pretrain (U-Net trains, VAD frozen) then
    finetune (VAD trains, U-Net frozen), through the se_v9 pipeline variant
    (reference: sj_train.py:299-339,467-469)."""
    from challenge_tpu.data.pipeline import DevicePipeline
    cfg = Config(model_type='se', v=9, n_frame=64, n_chan=2, batch_size=2,
                 pretrain=True)
    banks = _tiny_banks(cfg.n_frame)
    pipe = DevicePipeline(banks, cfg, training=True)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, seed=0)
    se_before = np.asarray(jax.tree.leaves(loop.state.params['se'])[0]).copy()
    vad_before = np.asarray(jax.tree.leaves(loop.state.params['vad'])[0]).copy()
    hist = loop.fit(pipe, epochs=1, steps_per_epoch=2)
    assert {'loss', 'class_loss', 'speech_loss', 'noise_loss',
            'class_er'} <= set(hist[0])
    se_after = np.asarray(jax.tree.leaves(loop.state.params['se'])[0])
    vad_after = np.asarray(jax.tree.leaves(loop.state.params['vad'])[0])
    assert np.abs(se_after - se_before).max() > 0        # U-Net trained
    np.testing.assert_array_equal(vad_after, vad_before)  # VAD frozen

    # finetune phase flips the mask
    cfg2 = cfg.replace(pretrain=False)
    loop2 = TrainLoop(get_model(cfg2), seed=0)
    loop2.set_weights(loop.state.weights())
    se_b = np.asarray(jax.tree.leaves(loop2.state.params['se'])[0]).copy()
    loop2.fit(DevicePipeline(banks, cfg2, training=True), epochs=1,
              steps_per_epoch=1)
    se_a = np.asarray(jax.tree.leaves(loop2.state.params['se'])[0])
    vad_a = np.asarray(jax.tree.leaves(loop2.state.params['vad'])[0])
    np.testing.assert_array_equal(se_a, se_b)             # U-Net frozen
    assert np.abs(vad_a - vad_before).max() > 0           # VAD trained


def test_fit_reuse_resets_run_state():
    """A second fit() on the same TrainLoop must not inherit the previous
    run's stop_training (one stale flag would end it after one epoch) and
    must return only its OWN epochs (self.history stays cumulative)."""
    from challenge_tpu.train import TerminateOnNaN, TrainLoop

    cfg = Config(model_type='vad', v=3, n_frame=64, n_chan=2, batch_size=2)

    def nan_loss(y, p):
        return jnp.float32(np.nan) + 0.0 * jnp.sum(p), {}

    # run 1 stops on the NaN after epoch 1 of 3
    loop = TrainLoop(get_model(cfg), seed=0,
                     banks=_tiny_banks(cfg.n_frame), loss_fn=nan_loss)
    h1 = loop.fit(epochs=3, steps_per_epoch=1, callbacks=[TerminateOnNaN()])
    assert len(h1) == 1 and loop.stop_training

    # run 2 on the same loop is NOT poisoned by the stale flag and its
    # returned history covers only its own epochs
    h2 = loop.fit(epochs=2, steps_per_epoch=1)
    assert len(h2) == 2
    assert len(loop.history) == 3   # cumulative record keeps both runs


@pytest.mark.slow
def test_fit_after_swa_does_not_double_donate():
    """SWA.on_train_end installs state.swa_weights() as the live params; if
    set_weights ALIASED those buffers, the next fused train step — which
    donates the whole TrainState — would pass XLA the same buffer as both
    params and swa_params ('Attempt to donate the same buffer twice').
    Regression for the aliasing found by an end-to-end double-fit drive."""
    from challenge_tpu.train import SWA, TrainLoop

    cfg = Config(model_type='vad', v=3, n_frame=64, n_chan=2, batch_size=2)
    loop = TrainLoop(get_model(cfg), seed=0, banks=_tiny_banks(cfg.n_frame))
    loop.fit(epochs=2, steps_per_epoch=1,
             callbacks=[SWA(start_epoch=1, swa_freq=1)])
    h = loop.fit(epochs=1, steps_per_epoch=1)   # crashed before the fix
    assert len(h) == 1 and np.isfinite(h[0]['loss'])


def test_swa_raises_when_never_triggered():
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, seed=0)
    swa = SWA(start_epoch=100)
    swa.set_loop(loop)
    with pytest.raises(NO_SWA_ERROR):
        swa.on_train_end()


def test_swa_average_matches_running_mean():
    from challenge_tpu.train.state import swa_update
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, seed=0)
    w0 = jax.tree.map(lambda x: np.asarray(x).copy(),
                      loop.state.params)
    loop.state = swa_update(loop.state)
    # perturb weights then average again
    loop.state = loop.state.replace(
        params=jax.tree.map(lambda x: x + 2.0, loop.state.params))
    loop.state = swa_update(loop.state)
    leaf0 = jax.tree.leaves(w0)[0]
    swa_leaf = np.asarray(jax.tree.leaves(loop.state.swa_params)[0])
    np.testing.assert_allclose(swa_leaf, leaf0 + 1.0, atol=1e-5)


def test_steps_per_fused_epoch_accounts_for_scan_rounding():
    """Resume epoch arithmetic: a fused epoch advances whole dispatches
    (ceil(steps/steps_per_call)*steps_per_call steps), and the CLIs divide
    the restored step count by THIS, not steps_per_epoch."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2, n_chan=2,
                 steps_per_call=8)
    banks = _tiny_banks(cfg.n_frame)
    loop = TrainLoop(get_model(cfg), banks=banks)
    assert loop.steps_per_fused_epoch(100) == 104   # 13 dispatches x 8
    assert loop.steps_per_fused_epoch(16) == 16     # divides evenly
    # non-fused mode: plain steps_per_epoch
    loop2 = TrainLoop(get_model(cfg.replace(steps_per_call=1)))
    assert loop2.steps_per_fused_epoch(100) == 100


@pytest.mark.slow
def test_resume_continues_rng_stream_exactly():
    """Epoch-keyed batch RNG: running epochs 0-1 straight through equals
    running epoch 0, 'resuming', and running epoch 1 — bit-identical
    params (a rolling split chain would replay epoch 0's batches)."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2, n_chan=2)
    banks = _tiny_banks(cfg.n_frame)

    loop_a = TrainLoop(get_model(cfg), seed=3, banks=banks)
    loop_a.fit(epochs=2, steps_per_epoch=2, validation_steps=1)

    loop_b = TrainLoop(get_model(cfg), seed=3, banks=banks)
    loop_b.fit(epochs=1, steps_per_epoch=2, validation_steps=1)
    loop_b.fit(epochs=2, steps_per_epoch=2, validation_steps=1,
               initial_epoch=1)   # the resume path

    flat_a = jax.tree.leaves(loop_a.state.params)
    flat_b = jax.tree.leaves(loop_b.state.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_se_frozen_half_batchnorm_runs_in_inference_mode():
    """Keras `submodel.trainable = False` forces that submodel's BN into
    inference mode (frozen moving stats, no updates) — the grad mask alone
    is not enough (reference: sj_train.py:306,316-318). Pretrain must
    leave 'vad' batch_stats untouched while 'se' stats update; finetune
    the reverse."""
    from challenge_tpu.data.pipeline import DevicePipeline

    def stats_delta(loop, pipe, part):
        before = [np.asarray(x).copy()
                  for x in jax.tree.leaves(loop.state.batch_stats[part])]
        loop.fit(pipe, epochs=1, steps_per_epoch=2)
        after = jax.tree.leaves(loop.state.batch_stats[part])
        return max(float(np.abs(np.asarray(a) - b).max())
                   for a, b in zip(after, before))

    banks = _tiny_banks(64)
    cfg = Config(model_type='se', v=9, n_frame=64, n_chan=2, batch_size=2,
                 pretrain=True)
    loop = TrainLoop(get_model(cfg), seed=0)
    pipe = DevicePipeline(banks, cfg, training=True)
    assert stats_delta(loop, pipe, 'vad') == 0.0    # frozen head: BN inert
    loop_se = TrainLoop(get_model(cfg), seed=0)
    assert stats_delta(loop_se, pipe, 'se') > 0.0   # training half updates

    cfg2 = cfg.replace(pretrain=False)
    loop2 = TrainLoop(get_model(cfg2), seed=0)
    pipe2 = DevicePipeline(banks, cfg2, training=True)
    assert stats_delta(loop2, pipe2, 'se') == 0.0
    loop2_v = TrainLoop(get_model(cfg2), seed=0)
    assert stats_delta(loop2_v, pipe2, 'vad') > 0.0
