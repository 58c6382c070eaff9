"""Trained-model quality demonstration (round-4 item): the challenge ER
must IMPROVE through real training — the one end-to-end behavior no unit
differential composes up to (reference behavior matched: the score
metrics.py:31-90 prints after a sj_train.py:513 fit).

Builds a synthetic 3-class corpus whose classes live in disjoint spectral
bands (harmonic stacks over broadband noise), trains vad v8 at reference
defaults on spec banks built through the real ingest chain (wav_to_spec),
and scores the challenge ER on a synthesized 60 s-clip dev set before and
after training, through the SAME evaluate() entry the eval CLI uses.

Usage: python scripts/trained_er_demo.py [epochs] [steps_per_epoch]
Prints one line per eval: mean ER untrained -> trained.
"""

import json
import os
import sys
import tempfile
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from challenge_tpu.config import Config  # noqa: E402
from challenge_tpu.data.pipeline import build_banks  # noqa: E402
from challenge_tpu.evaluate import evaluate  # noqa: E402
from challenge_tpu.models import get_model  # noqa: E402
from challenge_tpu.ops.dsp import wav_to_spec  # noqa: E402
from challenge_tpu.train import TrainLoop  # noqa: E402

SR = 16000
HOP = 256
# class -> fundamental (Hz); disjoint bands well inside the mel range
F0 = (440.0, 1320.0, 3300.0)


def event_wav(rng, cls, dur_s, sr=SR, amp=0.25):
    """A band-limited harmonic event: fundamental + 2 harmonics, Hann
    attack/release envelope, stereo with a small channel gain skew."""
    n = int(dur_s * sr)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for h, g in ((1, 1.0), (2, 0.5), (3, 0.25)):
        f = F0[cls] * h * float(rng.uniform(0.98, 1.02))
        x += g * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    ramp = min(n // 4, sr // 20)
    env = np.ones(n)
    env[:ramp] = np.hanning(2 * ramp)[:ramp]
    env[-ramp:] = np.hanning(2 * ramp)[ramp:]
    x = amp * x * env / np.abs(x).max()
    return np.stack([x, x * float(rng.uniform(0.8, 1.0))])  # [2, n]


def noise_wav(rng, dur_s, sr=SR, amp=0.05):
    """Broadband background: white noise lowpass-shaped by a cumsum."""
    n = int(dur_s * sr)
    x = rng.standard_normal((2, n))
    x = x + 0.5 * np.cumsum(x, axis=1) / np.sqrt(np.arange(1, n + 1))
    return (amp * x / np.abs(x).max()).astype(np.float64)


def spec_of(wav):
    return np.asarray(wav_to_spec(wav.astype(np.float32), SR))


# durations are quantized to a few static lengths: wav_to_spec compiles one
# program per (rate, length), and on the remote-compile tunnel every fresh
# length costs seconds — 4 + 3 + 1 distinct lengths total keeps bank
# construction fast
VOICE_DURS = (0.5, 1.0, 1.5, 2.0)
NOISE_DURS = (0.4, 0.7, 1.0)


def build_training_banks(rng, n_frame, n_per_class=24, n_bg=4, n_noise=8):
    voices, ids = [], []
    for cls in range(3):
        for _ in range(n_per_class):
            dur = VOICE_DURS[int(rng.integers(0, len(VOICE_DURS)))]
            voices.append(spec_of(event_wav(rng, cls, dur)))
            ids.append(cls)
    bgs = [spec_of(noise_wav(rng, (n_frame + 64) * HOP / SR))
           for _ in range(n_bg)]
    noises = [spec_of(noise_wav(
        rng, NOISE_DURS[int(rng.integers(0, len(NOISE_DURS)))], amp=0.15))
        for _ in range(n_noise)]
    labels = np.eye(3, dtype=np.float32)[np.asarray(ids)]
    return build_banks(bgs, voices, labels, noises, n_frame=n_frame)


def debug_grid_stats(cfg, bundle, variables, d, label):
    """Mean predicted probability inside vs outside true events, per class —
    separates 'never fires' from 'fires everywhere' when tuning the demo."""
    import json as _json
    from glob import glob as _glob

    import jax as _jax

    from challenge_tpu.evaluate.infer import HOP as _HOP
    from challenge_tpu.evaluate.infer import _wav_headers, devset_infer_body
    with open(os.path.join(d, 'sample_answer.json')) as f:
        answer = _json.load(f)['task2_answer']
    paths = sorted(_glob(os.path.join(d, '*.wav')))
    lens, chan = _wav_headers(paths)
    pcm = np.zeros((len(paths), chan, int(lens.max())), '<i2')
    for i, p in enumerate(paths):
        with wave.open(p, 'rb') as f:
            raw = np.frombuffer(f.readframes(f.getnframes()), '<i2')
        pcm[i, :, :lens[i]] = raw.reshape(-1, chan).T
    body, _ = devset_infer_body(bundle, cfg)
    grids = np.asarray(_jax.jit(body)(
        variables, pcm, lens.astype(np.int32),
        np.zeros(len(paths), np.int32)))
    inside, outside = [], []
    for i, p in enumerate(paths):
        stem = os.path.basename(p)[:-4]
        grid = grids[i, :int(lens[i]) // _HOP + 1]
        truth = np.zeros_like(grid)
        for cls, s, e in answer[stem]:
            truth[int(s * SR / _HOP):int(e * SR / _HOP) + 1, int(cls)] = 1
        inside.append(grid[truth > 0])
        outside.append(grid[truth == 0])
    ins = np.concatenate(inside) if inside else np.zeros(1)
    outs = np.concatenate(outside)
    print(f'[{label}] p(inside)={ins.mean():.3f} p(outside)={outs.mean():.3f}'
          f' frac>0.5 inside={np.mean(ins > .5):.3f}'
          f' outside={np.mean(outs > .5):.3f}', flush=True)


def write_dev_set(rng, d, n_clips=6, clip_s=60.0, events_per_clip=30):
    answer = {}
    for i in range(n_clips):
        stem = f'clip{i:02d}'
        bg = noise_wav(rng, clip_s)
        events = []
        tcur = 1.0
        for k in range(events_per_clip):
            # round-robin classes with short gaps so EVERY eval window
            # contains every class: the eval chain normalizes per mel ROW
            # (reference quirk, metrics.py:53) while training normalizes
            # per window — a class absent from a whole window gets its
            # rows minmax-stretched to full scale and the model
            # hallucinates it (measured: p(outside true events)=0.64 on a
            # sparse dev set vs val_er 0.004 on training windows)
            cls = k % 3
            dur = VOICE_DURS[int(rng.integers(1, len(VOICE_DURS)))]
            if tcur + dur > clip_s - 1.0:
                break
            # event RMS ~ the background's RMS: the training mixture
            # places voices at v_ratio in [0.25, 1] relative to an
            # RMS-matched background (snr=-6), so louder dev events are
            # out-of-distribution (measured: +14 dB events score WORSE
            # after training). amp 0.03 sine -> RMS ~0.02 vs the
            # peak-normalized noise background's ~0.017
            ev = event_wav(rng, cls, dur, amp=0.03)
            s0 = int(tcur * SR)
            bg[:, s0:s0 + ev.shape[1]] += ev
            events.append([cls, round(tcur, 3), round(tcur + dur, 3)])
            # training windows always contain 1-6 voices (the reference's
            # mixture draw), so the dev set keeps a comparable event
            # density — a sparse dev set is out-of-distribution and the
            # model's priors produce insertions (measured)
            tcur += dur + float(rng.uniform(0.3, 0.9))
        pcm = (np.clip(bg, -1, 1) * 32767).astype('<i2')
        with wave.open(os.path.join(d, f'{stem}.wav'), 'wb') as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(SR)
            f.writeframes(pcm.T.tobytes())
        answer[stem] = events
    with open(os.path.join(d, 'sample_answer.json'), 'w') as f:
        json.dump({'task2_answer': answer}, f)


def write_training_pickles(rng, d, n_frame):
    """Spec pickles + label npys in the reference's dataset format
    (reference: sj_train.py:74-90), consumed by the real sj_train CLI."""
    import pickle

    def specs(wavs):
        return [spec_of(w) for w in wavs]

    def voice_set(n_per_class):
        voices, ids = [], []
        for cls in range(3):
            for _ in range(n_per_class):
                dur = VOICE_DURS[int(rng.integers(0, len(VOICE_DURS)))]
                voices.append(event_wav(rng, cls, dur))
                ids.append(cls)
        return specs(voices), np.asarray(ids) * 10   # //10 remap quirk

    voices, ids = voice_set(24)
    test_voices, test_ids = voice_set(8)
    bgs = specs([noise_wav(rng, (n_frame + 64) * HOP / SR)
                 for _ in range(4)])
    test_bgs = specs([noise_wav(rng, (n_frame + 64) * HOP / SR)
                      for _ in range(2)])
    noises = specs([noise_wav(
        rng, NOISE_DURS[int(rng.integers(0, len(NOISE_DURS)))], amp=0.15)
        for _ in range(8)])
    for fname, obj in [('bg.pickle', bgs), ('voice.pickle', voices),
                       ('noise.pickle', noises), ('test_bg.pickle', test_bgs),
                       ('test_voice.pickle', test_voices)]:
        with open(os.path.join(d, fname), 'wb') as f:
            pickle.dump(obj, f)
    np.save(os.path.join(d, 'labels.npy'), ids)
    np.save(os.path.join(d, 'test_labels.npy'), test_ids)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    # optional third arg: bank storage dtype (float32|bfloat16|int8) — the
    # int8 run is the quantized-bank accuracy capstone (same ER as f32)
    bank_dtype = sys.argv[3] if len(sys.argv) > 3 else 'float32'
    rng = np.random.default_rng(0)
    # reference defaults except snr: -6 keeps the mixed voices audible
    # (the v_ratio draw is 10^-U(0, -snr/10) — at the default -20 voices
    # sink to -40 dB under an equally-RMS-normalized background)
    snr = -6
    cfg = Config(model_type='vad', v=8, name='erdemo', snr=snr,
                 epochs=epochs, steps_per_epoch=steps)
    run = cfg.run_name()
    print(f'config: {run}')
    bundle = get_model(cfg)

    with tempfile.TemporaryDirectory(prefix='er_demo_') as d:
        write_dev_set(rng, d)
        write_training_pickles(rng, d, cfg.n_frame)

        # untrained baseline through the same evaluate() the eval CLI uses
        var0 = bundle.init(jax.random.PRNGKey(0))
        er0 = evaluate(cfg, bundle, var0, eval_dir=d)
        print(f'untrained mean ER: {float(np.mean(er0)):.4f}  ({er0})',
              flush=True)
        debug_grid_stats(cfg, bundle, var0, d, 'untrained')

        # the REAL reference workflow: sj_train CLI fit (writes the
        # {run}/_SWA/_sample trio + CSV log; the EvalCallback scores this
        # very dev set at epochs 2, 7, ...), then the eval CLI on the trio
        import time

        from challenge_tpu.cli.eval import main as eval_main
        from challenge_tpu.cli.sj_train import main as sj_main
        cwd = os.getcwd()
        os.chdir(d)
        try:
            t0 = time.perf_counter()
            sj_main(['--name', 'erdemo', '--model_type', 'vad', '--v', '8',
                     '--snr', str(snr), '--epochs', str(epochs),
                     '--steps_per_epoch', str(steps),
                     '--bank_dtype', bank_dtype,
                     '--datapath', d,
                     '--background_sounds', 'bg.pickle',
                     '--voices', 'voice.pickle', '--labels', 'labels.npy',
                     '--noises', 'noise.pickle',
                     '--test_background_sounds', 'test_bg.pickle',
                     '--test_voices', 'test_voice.pickle',
                     '--test_labels', 'test_labels.npy'])
            t1 = time.perf_counter()
            print(f'fit wall {t1 - t0:.1f}s for {epochs}x{steps} steps')
            for suffix in ('', '_SWA'):
                scores = eval_main(['--name', run + suffix, '--p'])
                print(f'trained mean ER ({suffix or "best"}): '
                      f'{float(np.mean(scores)):.4f}  ({scores})', flush=True)
                from challenge_tpu.train.checkpoint import load_weights
                var1 = load_weights(f'{run}{suffix}.h5',
                                    bundle.init(jax.random.PRNGKey(0)),
                                    bundle=bundle)
                debug_grid_stats(cfg, bundle, var1, d,
                                 f'trained{suffix or "_best"}')
        finally:
            os.chdir(cwd)


if __name__ == '__main__':
    main()
