"""Trained-QUALITY head-to-head: our stack vs the REFERENCE stack, same
corpus, same recipe, each scored through its OWN challenge-eval chain.

The reference's entire purpose is the challenge score after training (the
evaluate() at /root/reference/metrics.py:89 after the fit at
/root/reference/sj_train.py:513); every other parity claim in this repo is
a differential on a sub-component. This harness closes the last unmeasured
claim by training BOTH stacks end to end on one shared synthetic corpus:

* corpus: the scaled-down 3-class harmonic-band recipe of
  tests/test_train.py::test_trained_er_improves (shared generators from
  scripts/trained_er_demo.py), written both as reference-format pickles
  (class ids in the c*10 convention its ``labels //= 10`` remap expects,
  sj_train.py:86-87) and as our banks — identical arrays;
* recipe: vad v3 at the reference's own defaults scaled down (adam
  clipvalue 0.01, BCE, constant lr=1e-3 on both sides — the 300-epoch
  warmup schedule starts 4x hot at this scale and collapses both stacks,
  see run_ours — identical epochs/steps/batch/snr/max_voices/max_noises,
  a shared validation set);
* scoring: final-epoch weights through each stack's own eval loop
  (ours: challenge_tpu.evaluate; theirs: reference metrics.evaluate run
  from the dev-set directory), same overlap_hop.

Usage: python scripts/ref_head_to_head.py [epochs] [steps]
Prints one JSON line with both trajectories and trained/untrained ERs.
The pinned comparison lives in
tests/test_reference_parity_train.py::test_trained_quality_head_to_head.
"""

import json
import os
import pickle
import sys
import tempfile
import wave

import numpy as np

# force the CPU platform BEFORE any jax backend initializes: the container's
# sitecustomize registers an axon TPU backend, and a head-to-head that grabs
# the (single-client) TPU tunnel would serialize against any concurrent TPU
# job — and the pinned test runs this on the CPU mesh anyway
if not os.environ.get('CHALLENGE_TPU_H2H_ANY_BACKEND'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax as _jax

    _jax.config.update('jax_platforms', 'cpu')

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trained_er_demo import HOP, SR, event_wav, noise_wav  # noqa: E402

N_FRAME, N_MELS, BATCH = 128, 40, 8
SNR, MAX_VOICES, LR = -2, 3, 1e-3
# max_noises=1 => ZERO noises mixed (the shared exclusive-upper-bound
# draw, reference pipeline.py:87): numpy_spec_of RMS-normalizes every
# clip, so mixed noises land as loud as the background and at 350 steps
# BOTH stacks collapse into the all-zero optimum (measured: loss ~0.457,
# f1 0) — the pinned-test difficulty keeps the comparison meaningful. The
# noise pickle still exists so the reference's loader path runs verbatim.
MAX_NOISES = 1


def numpy_spec_of(wav, n_fft=512, hop=HOP):
    """Numpy ingest stand-in (same as the pinned test's): RMS/10 norm +
    centered Hann STFT in the reference layout [freq, T, chan*2]; skips
    only the near-identity equal-rate lowpass so corpus construction does
    not pay one jit compile per distinct clip length."""
    w = wav / (np.sqrt(np.mean(wav ** 2)) * 10.0)
    x = np.pad(w, ((0, 0), (n_fft // 2, n_fft // 2)), mode='reflect')
    t = (x.shape[1] - n_fft) // hop + 1
    idx = np.arange(n_fft)[None, :] + hop * np.arange(t)[:, None]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    f = np.fft.rfft(x[:, idx] * win, axis=-1)
    spec = np.transpose(np.stack([f.real, f.imag]), (3, 2, 0, 1))
    return spec.reshape(spec.shape[0], spec.shape[1], -1).astype('f4')


def build_corpus(rng, d):
    """Shared corpus: train/test spec sets + a 3-clip dev set with ground
    truth. Event/band/density calibration follows the pinned test (events
    >= 0.75 s so the x32 label downsample keeps them; dev event RMS inside
    the training mixture's v_ratio range; round-robin classes so every
    eval window contains every class — the per-mel-row eval normalization
    quirk, reference metrics.py:53)."""
    def voice_set(n_per_class, amp=0.25):
        voices, ids = [], []
        for cls in range(3):
            for _ in range(n_per_class):
                dur = (0.75, 1.0)[int(rng.integers(0, 2))]
                voices.append(numpy_spec_of(event_wav(rng, cls, dur,
                                                      amp=amp)))
                ids.append(cls)
        return voices, np.asarray(ids)

    # EXACT pinned-test rng consumption order (voices -> backgrounds ->
    # dev clips): the task at this scale is draw-luck-sensitive — the SAME
    # recipe with 12 extra voice draws interleaved before the backgrounds
    # produced a corpus on which training collapses into the all-zero
    # optimum (measured: loss 0.456/f1 0.0 vs loss 0.321/f1 0.64 for the
    # test-ordered stream, seed 0). The pinned corpus is the calibrated
    # one; anything drawn after the dev set cannot perturb it.
    voices, ids = voice_set(10)
    bgs = [numpy_spec_of(noise_wav(rng, (N_FRAME + 32) * HOP / SR))
           for _ in range(3)]

    # dev set (identical recipe to the pinned test's)
    answer = {}
    for i in range(3):
        stem, clip_s = f'clip{i:02d}', 8.0
        bg = noise_wav(rng, clip_s)
        events = []
        for cls in range(3):
            tcur = 0.2 + cls * 0.6
            while True:
                dur = (0.75, 1.0)[int(rng.integers(0, 2))]
                if tcur + dur > clip_s - 0.2:
                    break
                ev = event_wav(rng, cls, dur, amp=0.02)
                s0 = int(tcur * SR)
                bg[:, s0:s0 + ev.shape[1]] += ev
                # INTEGER-second ground truth (floor/ceil-widened): the
                # reference's dev GT is integer seconds
                # (sample_answer.json) and its get_er compares the GT
                # tensor against int32 truncated prediction midpoints
                # (metrics.py:185,200) — float GT crashes its eager
                # LessEqual on mixed dtypes. Both stacks score the same
                # widened windows, so the comparison stays symmetric.
                events.append([cls, int(np.floor(tcur)),
                               int(np.ceil(tcur + dur))])
                tcur += dur + float(rng.uniform(0.9, 1.2))
        pcm = (np.clip(bg, -1, 1) * 32767).astype('<i2')
        with wave.open(os.path.join(d, f'{stem}.wav'), 'wb') as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(SR)
            f.writeframes(pcm.T.tobytes())
        answer[stem] = events
    with open(os.path.join(d, 'sample_answer.json'), 'w') as f:
        json.dump({'task2_answer': answer}, f)

    # drawn AFTER the dev set so the calibrated corpus stream is untouched;
    # never mixed (MAX_NOISES=1) but the reference's loader path needs the
    # pickle to exist
    noises = [numpy_spec_of(noise_wav(rng, 0.5, amp=0.15))
              for _ in range(6)]
    for fname, obj in [('bg.pickle', bgs), ('voice.pickle', voices),
                       ('noise.pickle', noises)]:
        with open(os.path.join(d, fname), 'wb') as f:
            pickle.dump(obj, f)
    # the c*10 id convention the reference's //10 remap expects
    np.save(os.path.join(d, 'labels.npy'), ids * 10)
    return (bgs, voices, ids, noises)


def run_ours(train_srcs, d, epochs, steps):
    """Our stack at the shared recipe: fused TrainLoop, final weights
    scored through our evaluate()."""
    import jax

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.evaluate import evaluate
    from challenge_tpu.models import get_model
    from challenge_tpu.train import TrainLoop

    bgs, voices, ids, noises = train_srcs
    cfg = Config(model_type='vad', v=3, n_mels=N_MELS, n_frame=N_FRAME,
                 n_chan=2, batch_size=BATCH, snr=SNR, max_voices=MAX_VOICES,
                 max_noises=MAX_NOISES, lr=LR, epochs=epochs,
                 steps_per_epoch=steps)
    banks = build_banks(bgs, voices, np.eye(3, dtype='f4')[ids], noises,
                        n_frame=N_FRAME)
    val = banks   # val == train corpus, like the pinned test (val metrics
    # are logged only; no callback consumes them here)
    bundle = get_model(cfg)
    loop = TrainLoop(bundle, banks=banks, val_banks=val, seed=0)
    er0 = [float(x) for x in evaluate(
        cfg, bundle, loop.state.weights(), overlap_hop=32, eval_dir=d)]
    # constant adam lr on BOTH stacks: the reference's warmup schedule is
    # calibrated for 300 epochs (peak ~1.56e-3 at epoch 25); at the
    # scaled-down 14 epochs it would START at 6.2e-3 — measured to collapse
    # BOTH stacks into the all-zero optimum (loss ~0.46, f1 0), which
    # compares nothing. lr=1e-3 matches the full-scale schedule's peak.
    hist = loop.fit(
        epochs=epochs, steps_per_epoch=steps, validation_steps=4, verbose=0)
    er1 = [float(x) for x in evaluate(
        cfg, bundle, loop.state.weights(), overlap_hop=32, eval_dir=d)]
    return {'untrained_er': er0, 'trained_er': er1,
            'final_loss': hist[-1]['loss'],
            'final_f1': hist[-1].get('f1_score'),
            # validation-window ER: the sharper, unsaturated quality
            # signal (the dev-set challenge ER suffers the 2 s max-pool
            # merge + per-mel-row quirk equally on both stacks)
            'final_val_er': hist[-1].get('val_er')}


def run_reference(d, epochs, steps, seed=0):
    """The REFERENCE stack end to end on the same corpus: its make_dataset
    (tf.data synthesis chain), its CustomModel + AGC train step, its Adam +
    warmup schedule, scored through its own metrics.evaluate from the
    dev-set directory (reference: sj_train.py:406-529, metrics.py:31-90)."""
    import types

    sys.path.insert(0, '/root/reference')
    try:
        from challenge_tpu.interop.refstubs import (
            install_keras2_compat, install_stubs)
        install_stubs()
        # Keras-2 API aliases (get_shape) the reference's AGC train step
        # needs under this image's Keras 3 — pure renames, no semantics
        install_keras2_compat()
        import tensorflow as tf
        try:
            tf.keras.utils.disable_interactive_logging()
        except Exception:
            pass
        tf.random.set_seed(seed)
        import metrics as ref_metrics     # noqa: reference module
        import sj_train as ref_sj         # noqa: reference module

        config = types.SimpleNamespace(
            model_type='vad', v=3, n_mels=N_MELS, n_frame=N_FRAME,
            n_chan=2, n_classes=3, name='', loss='BCE',
            batch_size=BATCH, lr=LR, clipvalue=0.01, optimizer='adam',
            mse_multiplier=1, snr=SNR, max_voices=MAX_VOICES,
            max_noises=MAX_NOISES,
            datapath=d,
            background_sounds='bg.pickle', voices='voice.pickle',
            labels='labels.npy', noises='noise.pickle',
            # validation draws from the SAME corpus (val == train, like
            # the pinned test) — the reference loader just re-reads the
            # training pickles
            test_background_sounds='bg.pickle',
            test_voices='voice.pickle', test_labels='labels.npy',
            epochs=epochs, steps_per_epoch=steps, lr_div=2.0)

        def build_and_compile():
            model = ref_sj.get_model(config)
            model.compile(
                optimizer=tf.keras.optimizers.Adam(
                    LR, clipvalue=config.clipvalue),
                loss=tf.keras.losses.BinaryCrossentropy(),
                metrics=[ref_metrics.cos_sim, ref_metrics.f1_score(),
                         ref_metrics.er_score(smoothing=False)])
            return model

        cwd = os.getcwd()
        os.chdir(d)
        try:
            model0 = build_and_compile()
            er0 = [float(x) for x in
                   ref_metrics.evaluate(config, model0, overlap_hop=32)]

            model = build_and_compile()
            train_set = ref_sj.make_dataset(config, training=True)
            test_set = ref_sj.make_dataset(config, training=False)
            # constant lr on both stacks — see run_ours (the 300-epoch
            # warmup schedule starts 4x hot at 14 epochs and collapses both
            # stacks to the all-zero optimum; also Keras 3's
            # LearningRateScheduler rejects the reference schedule's tensor
            # return outright)
            hist = model.fit(
                train_set, epochs=epochs, steps_per_epoch=steps,
                validation_data=test_set, validation_steps=4, verbose=0)
            er1 = [float(x) for x in
                   ref_metrics.evaluate(config, model, overlap_hop=32)]
        finally:
            os.chdir(cwd)
        h = hist.history
        # the er metric's history key follows its fn __name__ ('er',
        # metrics.py:220); if a Keras version renames it, record NaN for
        # the (unasserted, recorded-only) val trajectory rather than
        # losing a completed 350-step attempt to a StopIteration
        val_er_key = next((k for k in ('val_er', 'val_er_score')
                           if k in h), None)
        return {'untrained_er': er0, 'trained_er': er1,
                'final_loss': float(h['loss'][-1]),
                'final_f1': float(np.mean(h['f1_score'][-1])),
                'final_val_er': (float(np.mean(h[val_er_key][-1]))
                                 if val_er_key else float('nan'))}
    finally:
        sys.path.remove('/root/reference')


def run(epochs=14, steps=25, seed=0, workdir=None,
        ref_attempt_seeds=(0, 2, 3, 4, 5, 6)):
    """Train both stacks on the shared corpus and score them.

    Seeds: our side is fully deterministic (PRNG-threaded) and pinned to
    the calibrated loop seed 0. The reference's training draws are
    tf-global-seeded but its tf.data threading is not exactly
    reproducible, and — measured, round 5 — the 350-step task collapses
    into the all-zero/low-f1 optimum on roughly half the seeds on BOTH
    stacks (ours: loop seed 1 -> f1 0.0; theirs: tf seed 1 -> f1 0.057;
    the fragility is the scale, symmetrically, not a stack defect — and
    because TF threading is non-reproducible, the SAME tf seed can learn
    in one run and collapse in another: a full suite run saw all of
    (0, 2, 3) collapse, best f1 0.094, after the same three passed at
    calibration). The reference therefore gets up to
    ``len(ref_attempt_seeds)`` attempts with early exit on the first that
    genuinely learns (f1 > 0.2) — its best shot, which makes the parity
    claim conservative for OUR side; at the measured ~1/2 per-attempt
    collapse rate, six attempts put all-collapse at ~2%. If none passes
    the bar, ``reference`` is the best attempt by f1 and the caller
    decides (the pinned test skips: a comparison against a collapsed
    reference would be trivially easy for our side). All attempts are
    recorded in the result.
    """
    rng = np.random.default_rng(seed)
    ctx = (tempfile.TemporaryDirectory(prefix='head2head_')
           if workdir is None else None)
    d = workdir if workdir is not None else ctx.name
    try:
        import time as _time
        t0 = _time.perf_counter()
        train_srcs = build_corpus(rng, d)
        print(f'[h2h] corpus built {_time.perf_counter() - t0:.0f}s',
              file=sys.stderr, flush=True)
        ours = run_ours(train_srcs, d, epochs, steps)
        print(f'[h2h] ours done {_time.perf_counter() - t0:.0f}s: {ours}',
              file=sys.stderr, flush=True)
        attempts = []
        for s in ref_attempt_seeds:
            ref = run_reference(d, epochs, steps, seed=s)
            attempts.append({'seed': s, **ref})
            print(f'[h2h] reference seed {s} done '
                  f'{_time.perf_counter() - t0:.0f}s: {ref}',
                  file=sys.stderr, flush=True)
            if ref['final_f1'] > 0.2:
                break
        else:
            # every seed collapsed: surface the best attempt, not the last
            ref = max(attempts, key=lambda a: a['final_f1'])
        out = {'ours': ours, 'reference': ref,
               'ref_attempts': attempts,
               'ours_trained_mean': float(np.mean(ours['trained_er'])),
               'ref_trained_mean': float(np.mean(ref['trained_er'])),
               'ours_untrained_mean': float(np.mean(ours['untrained_er'])),
               'ref_untrained_mean': float(np.mean(ref['untrained_er'])),
               'epochs': epochs, 'steps': steps}
        return out
    finally:
        if ctx is not None:
            ctx.cleanup()


if __name__ == '__main__':
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    print(json.dumps(run(epochs=epochs, steps=steps)))
