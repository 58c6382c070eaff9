"""Headline benchmark: on-device log-mel pipeline throughput (clips/sec/chip).

Measures the fully-jitted mixture-synthesis -> STFT-magnitude -> mel ->
minmax -> log feature chain (the BASELINE.json north-star metric
"log-mel clips/sec/chip with on-device frontend") with the NOTES.md-sanctioned
methodology: a ``lax.scan`` of N batches inside ONE XLA program, consuming
every batch into a checksum that is fetched to host (so nothing can be
memoized or dead-code-eliminated between dispatches), best of 3 repeats.

Also measured each run (reported in the "extra" field of the same JSON line):
  * fused train-step throughput (synthesis+features+fwd/bwd+AGC+adam in one
    program, vad v8 bf16, steps_per_call scanned) — the perf axis that
    actually limits training;
  * pallas-vs-XLA synthesis parity on the live backend (max |diff| must be
    ~0; a regression fails the bench loudly).

Then times the *reference's own* tf.data CPU pipeline (pipeline.py +
transforms.py under TensorFlow on host) on identical data for ``vs_baseline``.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N,
   "extra": {...}}
"""

import json
import os
import sys
import time

import numpy as np


def make_data(n_frame):
    rng = np.random.default_rng(0)
    bgs = [rng.standard_normal((257, n_frame + 500, 4)).astype('f4') * 0.1
           for _ in range(15)]
    # one background SHORTER than the window: the reference tiles it
    # (pipeline.py:29-35); with wrap_frames-built banks the Pallas parity
    # check covers the wrap path on real hardware too
    bgs.append(rng.standard_normal((257, n_frame // 3, 4)).astype('f4') * 0.1)
    voices = [rng.standard_normal((257, rng.integers(60, 120), 4)
                                  ).astype('f4') * 0.1 for _ in range(32)]
    labels = rng.integers(0, 3, size=32)
    noises = [rng.standard_normal((257, rng.integers(30, 60), 4)
                                  ).astype('f4') * 0.1 for _ in range(8)]
    return bgs, voices, labels, noises


def bench_pipeline(banks, batch_size, n_frame, iters=30, repeats=5):
    """Scan-of-N-batches-in-one-program throughput (clips/sec/chip).
    Returns (best, median) over repeats: best is the headline (comparable
    with earlier rounds); the median tracks the ~10% tunnel/run variance
    NOTES.md documents for this metric."""
    import jax
    import jax.numpy as jnp
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size)
    fn = make_feature_fn(cfg, training=True, jit=False)

    @jax.jit
    def program(key):
        def body(acc, k):
            x, y = fn(k, banks)
            return acc + jnp.sum(x) + jnp.sum(y), None
        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), keys)
        return acc

    assert np.isfinite(float(program(jax.random.PRNGKey(99))))  # compile
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        # fetch, don't just block (see time_fused_step: block_until_ready
        # can return early on the axon tunnel; the checksum fetch is the
        # only sync a remote backend cannot fake)
        out = float(program(jax.random.PRNGKey(r)))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(out)
    return (batch_size * iters / min(times),
            batch_size * iters / float(np.median(times)))


def check_pallas_parity(banks, batch_size, n_frame):
    """Run the synthesis+feature chain with the Pallas placement kernel and
    the XLA scatter path on the SAME key; returns (ran, max_abs_diff).
    Only meaningful on a TPU backend (elsewhere the Pallas path isn't used
    in anger; interpret-mode equality is covered by tests)."""
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    if jax.default_backend() != 'tpu':
        return False, None
    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size)
    key = jax.random.PRNGKey(7)
    with_pl = make_feature_fn(cfg, training=True, use_pallas=True)(key, banks)
    no_pl = make_feature_fn(cfg, training=True, use_pallas=False)(key, banks)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        with_pl, no_pl)
    return True, max(jax.tree.leaves(diffs))


def check_bank_dtype_parity(banks_q, banks32, batch_size, n_frame):
    """Reduced-precision-bank (bf16/int8) Pallas features vs the exact f32
    XLA path, same key: labels must be bit-identical (they come from f32
    masks either way); returns the mean |feature diff| (None off-TPU)."""
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import make_feature_fn

    if jax.default_backend() != 'tpu':
        return None
    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size)
    key = jax.random.PRNGKey(7)
    x16, y16 = make_feature_fn(cfg, training=True,
                               use_pallas=True)(key, banks_q)
    x32, y32 = make_feature_fn(cfg, training=True,
                               use_pallas=False)(key, banks32)
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))
    return float(np.mean(np.abs(np.asarray(x16, np.float32)
                                - np.asarray(x32, np.float32))))


def time_fused_step(cfg, bundle, banks, steps_per_call=20, repeats=3,
                    variant='sj', loss_fn=None):
    """Shared fused-train-step timing harness (NOTES.md methodology: warm
    compile, then best of N scan-of-steps dispatches with metrics fetched).
    Used by bench_train_step and scripts/{family_bench,remat_probe}.py —
    keep the methodology in ONE place. Returns seconds per optimizer step."""
    import jax
    from challenge_tpu.parallel import make_fused_train_step
    from challenge_tpu.train import init_state

    fused, opt = make_fused_train_step(bundle, cfg, mesh=None,
                                       variant=variant, loss_fn=loss_fn,
                                       steps_per_call=steps_per_call)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state, metrics = fused(state, banks, jax.random.PRNGKey(1))  # compile
    assert np.isfinite(float(metrics['loss']))
    best = float('inf')
    for r in range(repeats):
        t0 = time.perf_counter()
        state, metrics = fused(state, banks, jax.random.PRNGKey(2 + r))
        # FETCH a scalar, don't just block: on the axon tunnel,
        # jax.block_until_ready was observed (round 5) returning before
        # the dispatched program finished — a scan of 5 se_v9 steps
        # "measured" 0.68 ms vs its real 259 ms/step until the loss value
        # was actually pulled. A host fetch cannot lie; its one ~10-40 ms
        # RTT amortizes over the steps_per_call-step scan.
        loss = float(metrics['loss'])
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(loss)
    return best / steps_per_call


def bench_train_step(banks, batch_size=64, n_frame=512, steps_per_call=20,
                     repeats=3):
    """Fused train-step throughput (clips/sec/chip), scan methodology:
    steps_per_call optimizer steps per dispatch, metrics fetched."""
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_model

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size, compute_dtype='bfloat16')
    step_s = time_fused_step(cfg, get_model(cfg), banks,
                             steps_per_call=steps_per_call, repeats=repeats)
    return batch_size / step_s, step_s


def bench_family_steps(banks512, srcs512):
    """Fused train-step times for the OTHER model families (round-3 verdict:
    BENCH tracked only vad, so eff/se/density regressions were invisible to
    the driver artifact). One hardware-native point per family; the whole
    workload (config + bundle + variant + loss) comes from
    scripts/family_bench.build — the single source of truth the
    profiling/probe tooling also measures, so the BENCH artifact and NOTES
    tables always describe the same thing. The caller's 512-frame banks
    are reused; only the density family's 2048-frame set is built here
    (and dropped before the eval benchmarks run)."""
    import sys

    from challenge_tpu.data.pipeline import build_banks

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'scripts'))
    from family_bench import build

    out = {}
    banks_by_frame = {512: banks512}
    for name, key in (('eff0_128', 'eff_b0_v1_B128_step_ms'),
                      ('se9_64', 'se_v9_B64_step_ms'),
                      ('density_b0_12', 'density_b0_B12_step_ms')):
        cfg, bundle, variant, loss_fn = build(name)
        if cfg.n_frame not in banks_by_frame:
            bgs, voices, labels, noises = (srcs512 if cfg.n_frame == 512
                                           else make_data(cfg.n_frame))
            banks_by_frame[cfg.n_frame] = build_banks(
                bgs, voices, labels, noises, n_frame=cfg.n_frame)
        s = time_fused_step(cfg, bundle, banks_by_frame[cfg.n_frame],
                            variant=variant, loss_fn=loss_fn,
                            steps_per_call=10, repeats=2)
        out[key] = round(s * 1e3, 3)
        if name == 'se9_64':
            # the round-5 capability: the heaviest family on int8 SLIM
            # banks (seperate_noise_voice targets via the per-source-group
            # Pallas calls; 0.155x bank HBM) — tracked so a slim-path
            # regression is driver-visible
            bgs, voices, labels, noises = (srcs512 if cfg.n_frame == 512
                                           else make_data(cfg.n_frame))
            slim = build_banks(bgs, voices, labels, noises,
                               n_frame=cfg.n_frame, flat_dtype='int8',
                               data_resident=False)
            s = time_fused_step(cfg, bundle, slim, variant=variant,
                                loss_fn=loss_fn, steps_per_call=10,
                                repeats=2)
            out['se_v9_B64_slim_int8_step_ms'] = round(s * 1e3, 3)
            del slim
    return out


def bench_streaming(bgs, voices, labels, noises, batch_size=128,
                    n_frame=512, steps_per_call=4, n_dispatches=16):
    """Streaming bank rotation vs resident banks, measured (round-4 verdict:
    the rotation's 'swap is free when a chunk's dispatches outlast its
    upload' claim had no number in the driver artifact).

    Times n_dispatches fused vad-v8 dispatches (steps_per_call steps each,
    bf16 compute) three ways on identical data: resident banks, a 2-chunk
    f32 rotation, and a 2-chunk int8+slim rotation — each at chunk_steps
    chosen so a swap happens every other dispatch (the aggressive end; the
    NOTES rule of thumb picks chunk_steps so chunk_steps * dispatch_time >
    chunk_bytes / h2d_bandwidth). Also measures the raw h2d upload
    bandwidth of one chunk (fresh buffers — repeated uploads of the same
    ndarray get memoized and read 25x too fast, NOTES pitfall)."""
    import jax

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.data.streaming import build_streaming_banks
    from challenge_tpu.models import get_model
    from challenge_tpu.parallel import make_fused_train_step
    from challenge_tpu.train import init_state

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size, compute_dtype='bfloat16',
                 steps_per_call=steps_per_call)
    bundle = get_model(cfg)
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None, variant='sj',
                                       steps_per_call=steps_per_call)

    def run_dispatches(next_banks):
        state = init_state(bundle, jax.random.PRNGKey(0), opt)
        state, m = fused(state, next_banks(), jax.random.PRNGKey(1))
        assert np.isfinite(float(m['loss']))  # compile + uploads settle
        t0 = time.perf_counter()
        for i in range(n_dispatches):
            state, m = fused(state, next_banks(), jax.random.PRNGKey(2 + i))
        # ONE scalar fetch syncs the whole dispatch chain (block_until_ready
        # can return early on the axon tunnel — see time_fused_step); its
        # single RTT amortizes over the n_dispatches window
        loss = float(m['loss'])
        dt = (time.perf_counter() - t0) / n_dispatches
        assert np.isfinite(loss)
        return dt

    resident = build_banks(bgs, voices, labels, noises, n_frame=n_frame)
    res_s = run_dispatches(lambda: resident)
    del resident

    out = {'train_resident_dispatch_ms': round(res_s * 1e3, 2)}
    # (dtype tag, chunk_steps): 2 is the aggressive end (a swap every other
    # dispatch — exposes any upload stall); the second int8 point sits just
    # above the measured break-even so the "rotation hides behind compute"
    # claim is demonstrated, not only its failure mode. Break-even rule
    # (NOTES): chunk_steps * dispatch_time > chunk_bytes / h2d_bandwidth.
    for label_key, dtype, resident_data, chunk_steps in (
            ('f32', 'float32', True, 2),
            ('int8_slim', 'int8', False, 2),
            ('int8_slim_cs4', 'int8', False, 4)):
        sb = build_streaming_banks(
            bgs, voices, labels, noises, n_chunks=2, n_frame=n_frame,
            flat_dtype=dtype, chunk_steps=chunk_steps,
            data_resident=resident_data)
        # force every rotation upload onto FRESH host buffers: a real
        # rotation also re-device_puts the same chunk ndarrays, but at
        # bench scale nothing evicts the previous device copy, so repeated
        # puts of an unchanged buffer can be elided (the upload-memoization
        # pitfall above) and the overhead would read near-zero even when
        # chunk_bytes/h2d_bw >> chunk_steps*dispatch_time. Copies measure
        # the worst honest case — what a genuinely-beyond-HBM dataset pays.
        orig_put = sb._put
        sb._put = lambda chunk: orig_put(jax.tree.map(np.copy, chunk))
        chunk_mb = sum(x.nbytes for x in jax.tree.leaves(sb.chunks[0])) / 1e6
        # fresh-buffer upload bandwidth of one chunk (what bounds rotation)
        t0 = time.perf_counter()
        up = jax.device_put(jax.tree.map(np.copy, sb.chunks[0]))
        jax.block_until_ready(up)
        # block_until_ready alone proved untrustworthy on the tunnel (see
        # time_fused_step); fetch one scalar from the byte-dominant leaf as
        # the unfakeable sync. Residual error: one ~10-40 ms RTT, small vs
        # the multi-second f32 upload and conservative (understates bw)
        # for the ~0.3 s int8 chunks.
        big = max(jax.tree.leaves(up), key=lambda x: x.nbytes)
        assert np.isfinite(float(big.ravel()[0]))   # 1-element fetch
        up_s = time.perf_counter() - t0
        del up, big
        stream_s = run_dispatches(sb.next_banks)
        out[f'train_streaming_{label_key}_overhead_pct'] = round(
            100.0 * (stream_s - res_s) / res_s, 1)
        out[f'stream_chunk_{label_key}_mb'] = round(chunk_mb, 1)
        out[f'stream_h2d_{label_key}_mb_per_s'] = round(chunk_mb / up_s, 1)
        del sb
    return out


def bench_epoch(bgs, voices, labels, noises, n_frame=512):
    """Composed epoch wall-clock at reference defaults (100 steps B=12 +
    16 validation steps, sj_train.py:57-60,513) through TrainLoop.fit with
    the CLI's callback stack (minus the every-5-epochs EvalCallback, which
    is benched separately as devset eval) — catches regressions in
    callback/validation plumbing no step-level number sees. Median of the
    post-warmup epochs."""
    import tempfile

    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.models import get_model
    from challenge_tpu.train import (
        CSVLogger, EarlyStopping, LearningRateScheduler, ModelCheckpoint,
        SWA, TerminateOnNaN, TrainLoop, custom_scheduler)

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=12, compute_dtype='bfloat16',
                 steps_per_call=20)
    banks = build_banks(bgs, voices, labels, noises, n_frame=n_frame)
    loop = TrainLoop(get_model(cfg), banks=banks, val_banks=banks, seed=0)
    with tempfile.TemporaryDirectory(prefix='bench_epoch_') as d:
        callbacks = [
            CSVLogger(os.path.join(d, 'log.csv'), append=True),
            SWA(start_epoch=1, swa_freq=2),
            ModelCheckpoint(os.path.join(d, 'best.h5'), monitor='val_er',
                            save_best_only=True, verbose=0),
            TerminateOnNaN(),
            EarlyStopping(monitor='val_loss', patience=10,
                          restore_best_weights=True),
            LearningRateScheduler(custom_scheduler(4096, 300 / 12, 2.0)),
        ]
        # the callbacks print like the reference (SWA's "Saving Weights",
        # checkpoint notices) — route them to stderr so bench stdout stays
        # exactly one JSON line
        import contextlib
        with contextlib.redirect_stdout(sys.stderr):
            hist = loop.fit(epochs=4, steps_per_epoch=100,
                            validation_steps=16, callbacks=callbacks,
                            verbose=0)
    times = [h['time'] for h in hist[1:]]   # epoch 1 pays the compiles
    return float(np.median(times))


def make_eval_corpus(tmp, n_clips=6, seconds=60.0):
    """Synthesized dev-set stand-in: n_clips 60 s stereo 16 kHz wavs +
    ground truth, shared by our eval AND the reference eval timing."""
    import json as _json
    import wave as wave_mod

    rng = np.random.default_rng(0)
    answer = {}
    for i in range(n_clips):
        stem = f'clip{i:02d}'
        n = int(seconds * 16000)
        pcm = (rng.standard_normal((n, 2)) * 3000).astype(np.int16)
        with wave_mod.open(f'{tmp}/{stem}.wav', 'wb') as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())
        answer[stem] = [[0, 1, 2], [1, 10, 12]]
    with open(f'{tmp}/sample_answer.json', 'w') as f:
        _json.dump({'task2_answer': answer}, f)


def bench_eval(eval_dir, n_clips=6):
    """Warm dev-set eval wall-clock (BASELINE axis: full challenge eval on
    6x~60s clips): vad v8 at reference shapes, second run timed (first run
    pays compiles)."""
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.evaluate import evaluate
    from challenge_tpu.models import get_model

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=512, n_chan=2,
                 batch_size=12)
    bundle = get_model(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))
    evaluate(cfg, bundle, variables, eval_dir=eval_dir)  # compile/warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        scores = evaluate(cfg, bundle, variables, eval_dir=eval_dir)
        times.append(time.perf_counter() - t0)
    assert len(scores) == n_clips
    # median-of-5: the eval axis swings with host load (NOTES.md), so the
    # ~200x claim is anchored on medians on BOTH sides, not single runs
    return float(np.median(times))


def bench_reference_eval(eval_dir, n_clips=6):
    """Time the REFERENCE's own evaluate loop (metrics.py:31-90: per-file
    torch-stub load_wav + eager TF feature chain + Keras model.predict) on
    the same wavs, same machine — the denominator of the BASELINE.json
    '< 1/10 reference wall-clock' eval target. Untrained Keras vad v8 at
    the same shapes; first run warms TF graph building, second run timed.
    The torchaudio stub skips the 16k->16k resample (conservative: favors
    the reference)."""
    import types

    sys.path.insert(0, '/root/reference')
    try:
        from challenge_tpu.interop.refstubs import install_stubs
        install_stubs()
        import tensorflow as tf
        # keras model.predict progress bars would break the one-JSON-line
        # stdout contract; route keras logging through absl (stderr)
        try:
            tf.keras.utils.disable_interactive_logging()
        except Exception:
            pass
        import metrics as ref_metrics      # noqa: reference module
        import sj_train as ref_sj          # noqa: reference module
        cfg = types.SimpleNamespace(model_type='vad', v=8, n_mels=80,
                                    n_frame=512, n_chan=2, n_classes=3,
                                    name='')
        model = ref_sj.get_model(cfg)
        cwd = os.getcwd()
        try:
            os.chdir(eval_dir)
            scores = ref_metrics.evaluate(cfg, model)   # warm
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                scores = ref_metrics.evaluate(cfg, model)
                times.append(time.perf_counter() - t0)
            # the reference loop swings 15.7-33.2 s with host load across
            # rounds (BASELINE.md) — report the median of 5 warm runs so
            # eval_vs_baseline is stable round-over-round
            dt = float(np.median(times))
        finally:
            os.chdir(cwd)
        assert len(scores) == n_clips
        return dt
    except Exception as e:
        print(f'reference eval baseline unavailable: {e}', file=sys.stderr)
        return None
    finally:
        sys.path.remove('/root/reference')


def bench_reference_cpu(bgs, voices, labels, noises, batch_size, n_frame,
                        iters=10):
    """Time the reference's own tf.data chain (pipeline.make_pipeline +
    transforms complex_to_magphase/magphase_to_mel) on host CPU."""
    try:
        import tensorflow as tf
        tf.config.set_visible_devices([], 'GPU')
        sys.path.insert(0, '/root/reference')
        import pipeline as ref_pipeline        # noqa: reference module
        import transforms as ref_transforms    # noqa: reference module
    except Exception as e:
        print(f'reference baseline unavailable: {e}', file=sys.stderr)
        return None
    try:
        one_hot = np.eye(3, dtype='f4')[labels]
        ds = ref_pipeline.make_pipeline(
            bgs, voices, one_hot, noises, n_frame=n_frame,
            max_voices=7, max_noises=2, n_classes=3, snr=-20, min_ratio=1)
        ds = ds.map(lambda x, y: (x, tf.reduce_sum(y, axis=-3)))
        ds = ds.batch(batch_size)
        ds = ds.map(ref_transforms.complex_to_magphase)
        ds = ds.map(ref_transforms.magphase_to_mel(80))
        ds = ds.map(lambda x, y: (
            tf.math.log(x + 1e-8), y))
        ds = ds.prefetch(tf.data.experimental.AUTOTUNE)
        it = iter(ds)
        next(it)  # warmup/build
        t0 = time.perf_counter()
        for _ in range(iters):
            next(it)
        dt = time.perf_counter() - t0
        return batch_size * iters / dt
    except Exception as e:
        print(f'reference baseline failed: {e}', file=sys.stderr)
        return None
    finally:
        sys.path.remove('/root/reference')


def main():
    batch_size, n_frame = 512, 512
    bgs, voices, labels, noises = make_data(n_frame)

    from challenge_tpu.data.pipeline import build_banks
    banks = build_banks(bgs, voices, labels, noises, n_frame=n_frame)
    assert banks.backgrounds.contig_exact_frames >= n_frame, \
        'short-background wrap must keep the pallas path eligible'

    tpu_cps, tpu_cps_med = bench_pipeline(banks, batch_size, n_frame)
    pallas_ran, pallas_diff = check_pallas_parity(banks, batch_size, n_frame)
    if pallas_ran and not pallas_diff <= 1e-5:
        raise AssertionError(
            f'pallas-vs-XLA synthesis divergence on device: {pallas_diff}')
    # bfloat16 flat banks (Config.bank_dtype='bfloat16'): half the synthesis
    # kernel's DMA bytes; mixing still accumulates f32 in-kernel, so the
    # only divergence vs the exact f32 XLA path is input storage rounding
    # (~2^-8 relative per clip). Bounded here on the live backend by MEAN
    # feature error + exact labels — the max is dominated by log-domain
    # blowup on near-zero (cancellation) mel bins and is not meaningful.
    banks16 = build_banks(bgs, voices, labels, noises, n_frame=n_frame,
                          flat_dtype='bfloat16')
    tpu_cps16, _ = bench_pipeline(banks16, batch_size, n_frame)
    b16_mean = check_bank_dtype_parity(banks16, banks, batch_size, n_frame)
    if b16_mean is not None and not b16_mean <= 5e-3:
        raise AssertionError(
            f'bf16-bank pallas vs f32 XLA mean feature error: {b16_mean}')
    # int8 flat banks (Config.bank_dtype='int8'): per-item max-abs
    # quantization, dequant scales folded into the mix — a CAPACITY knob
    # (with data_resident=False the bank HBM drops to ~0.155x f32-resident,
    # 6.4x max dataset per chip), measured ~7% slower than bf16 on v5e
    # (the int8->f32 VPU upcast outweighs the saved DMA). Built slim here,
    # which also exercises the data-pruned dispatch path on the live chip.
    banks8 = build_banks(bgs, voices, labels, noises, n_frame=n_frame,
                         flat_dtype='int8', data_resident=False)
    tpu_cps8, _ = bench_pipeline(banks8, batch_size, n_frame)
    b8_mean = check_bank_dtype_parity(banks8, banks, batch_size, n_frame)
    if b8_mean is not None and not b8_mean <= 2e-2:
        raise AssertionError(
            f'int8-bank pallas vs f32 XLA mean feature error: {b8_mean}')

    def bank_mb(bk):
        import jax
        return sum(x.nbytes for x in jax.tree.leaves(bk)) / 1e6
    capacity_ratio = round(bank_mb(banks8) / bank_mb(banks), 3)
    del banks8
    train_cps64, step_s64 = bench_train_step(banks)
    train_cps128, step_s128 = bench_train_step(banks, batch_size=128)
    family = bench_family_steps(banks, (bgs, voices, labels, noises))
    streaming = bench_streaming(bgs, voices, labels, noises)
    epoch_s = bench_epoch(bgs, voices, labels, noises)
    import tempfile
    with tempfile.TemporaryDirectory(prefix='bench_eval_') as eval_dir:
        make_eval_corpus(eval_dir)
        eval_s = bench_eval(eval_dir)
        ref_eval_s = bench_reference_eval(eval_dir)
    # serving-scale point: 48x60 s evaluates as equal-shape chunks reusing
    # one compiled program (~17 ms/clip linear; the pre-chunking fallback
    # measured ~250 ms/clip)
    with tempfile.TemporaryDirectory(prefix='bench_eval48_') as d48:
        make_eval_corpus(d48, n_clips=48)
        eval48_s = bench_eval(d48, n_clips=48)
    ref_cps = bench_reference_cpu(bgs, voices, labels, noises,
                                  min(batch_size, 64), n_frame)
    vs = (tpu_cps / ref_cps) if ref_cps else None
    print(json.dumps({
        'metric': 'logmel_clips_per_sec_per_chip',
        'value': round(tpu_cps, 2),
        'unit': 'clips/sec/chip',
        'vs_baseline': round(vs, 2) if vs else None,
        'extra': {
            # B=128 is the hardware-native batch (fills the 128-lane
            # tiling): the primary train-step number. B=64 kept as the
            # fixed-batch comparable with earlier rounds.
            'train_step_clips_per_sec': round(train_cps128, 2),
            'train_step_ms': round(step_s128 * 1e3, 3),
            'train_step_config': 'vad v8 B=128 bf16 x20 scanned',
            'train_step_b64_clips_per_sec': round(train_cps64, 2),
            'train_step_b64_ms': round(step_s64 * 1e3, 3),
            'devset_eval_warm_s': round(eval_s, 3),
            'devset_eval_config': '6x60s clips, vad v8, warm (median of 5: '
                                  'one-program batched eval, corpus '
                                  'device-resident)',
            'eval_48clips_warm_s': round(eval48_s, 3),
            'reference_eval_median_s':
                round(ref_eval_s, 3) if ref_eval_s else None,
            'eval_vs_baseline':
                round(ref_eval_s / eval_s, 2) if ref_eval_s else None,
            'pallas_vs_xla_max_abs_diff': pallas_diff,
            'pipeline_bf16_banks_clips_per_sec': round(tpu_cps16, 2),
            'bf16_banks_vs_f32_xla_mean_abs_err': b16_mean,
            'pipeline_int8_banks_clips_per_sec': round(tpu_cps8, 2),
            'int8_banks_vs_f32_xla_mean_abs_err': b8_mean,
            'int8_slim_bank_hbm_vs_f32_resident': capacity_ratio,
            'pipeline_median_clips_per_sec': round(tpu_cps_med, 2),
            'pipeline_methodology': 'lax.scan of 30 batches, one program,'
                                    ' checksum fetched, best of 5'
                                    ' (median also reported)',
            # composed epoch at reference defaults (100 steps B=12 + 16 val
            # + CLI callback stack): catches callback/validation plumbing
            # regressions no step-level number sees
            'epoch_s': round(epoch_s, 3),
            **streaming,
            **family,
        },
    }))


if __name__ == '__main__':
    main()
