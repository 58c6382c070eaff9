"""Headline benchmark: on-device log-mel pipeline throughput (clips/sec/chip).

Measures the fully-jitted mixture-synthesis -> STFT-magnitude -> mel ->
minmax -> log feature chain (the BASELINE.json north-star metric
"log-mel clips/sec/chip with on-device frontend") on the default accelerator,
then times the *reference's own* tf.data CPU pipeline (pipeline.py +
transforms.py running under TensorFlow on host) on identical data for the
``vs_baseline`` ratio.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def make_data(n_frame):
    rng = np.random.default_rng(0)
    bgs = [rng.standard_normal((257, n_frame + 500, 4)).astype('f4') * 0.1
           for _ in range(16)]
    voices = [rng.standard_normal((257, rng.integers(60, 120), 4)
                                  ).astype('f4') * 0.1 for _ in range(32)]
    labels = rng.integers(0, 3, size=32)
    noises = [rng.standard_normal((257, rng.integers(30, 60), 4)
                                  ).astype('f4') * 0.1 for _ in range(8)]
    return bgs, voices, labels, noises


def bench_tpu(bgs, voices, labels, noises, batch_size, n_frame, iters=30):
    import jax
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import build_banks, make_feature_fn

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size)
    banks = build_banks(bgs, voices, labels, noises)
    fn = make_feature_fn(cfg, training=True)
    key = jax.random.PRNGKey(0)

    # warmup / compile (cold remote compile can take minutes; cached after)
    keys = jax.random.split(key, iters + 4)
    jax.block_until_ready(fn(keys[-1], banks))

    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(keys[i], banks)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    n_chips = 1  # feature fn runs on one chip here
    return batch_size * iters / dt / n_chips


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

    tpu_cps = bench_tpu(bgs, voices, labels, noises, batch_size, n_frame)
    ref_cps = bench_reference_cpu(bgs, voices, labels, noises,
                                  min(batch_size, 64), n_frame)
    vs = (tpu_cps / ref_cps) if ref_cps else None
    print(json.dumps({
        'metric': 'logmel_clips_per_sec_per_chip',
        'value': round(tpu_cps, 2),
        'unit': 'clips/sec/chip',
        'vs_baseline': round(vs, 2) if vs else None,
    }))


if __name__ == '__main__':
    main()
