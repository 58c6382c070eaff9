"""Break down the fused train step's time on the live backend.

Times, with the NOTES.md scan methodology (lax.scan of N iterations inside
one program, outputs consumed into a fetched checksum):
  * features  — synthesis + log-mel + SpecAugment only
  * forward   — model apply (train mode) on a fixed batch
  * fwd+bwd   — value_and_grad on a fixed batch
  * full step — the real fused train step (features + grad + AGC + adam)
and prints each stage's time plus XLA cost_analysis flops/bytes so we can
tell MXU-bound from HBM-bound stages.

Usage: python scripts/perf_probe.py [batch] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')

from bench import make_data  # noqa: E402
from challenge_tpu.config import Config  # noqa: E402
from challenge_tpu.data.pipeline import build_banks, make_feature_fn  # noqa: E402
from challenge_tpu.models import get_model  # noqa: E402
from challenge_tpu.parallel import make_fused_train_step  # noqa: E402
from challenge_tpu.train import init_state  # noqa: E402
from challenge_tpu.train.state import make_train_step  # noqa: E402


def timed(name, program, *args, repeats=3):
    out = program(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = program(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def cost(program, *args):
    try:
        an = program.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return (an.get('flops', 0), an.get('bytes accessed', 0))
    except Exception as e:  # pragma: no cover
        print(f'  cost_analysis failed: {e}')
        return (0, 0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_frame = 512
    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch, compute_dtype='bfloat16')

    bgs, voices, labels, noises = make_data(n_frame)
    banks = build_banks(bgs, voices, labels, noises)
    bundle = get_model(cfg)

    feat = make_feature_fn(cfg, training=True, jit=False)

    @jax.jit
    def feat_scan(key):
        def body(acc, k):
            x, y = feat(k, banks)
            return acc + jnp.sum(x) + jnp.sum(y), None
        keys = jax.random.split(key, steps)
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), keys)
        return acc

    key = jax.random.PRNGKey(0)
    x0, y0 = jax.jit(feat)(key, banks)
    x0, y0 = jax.block_until_ready((x0, y0))

    variables = bundle.init(jax.random.PRNGKey(1))

    @jax.jit
    def fwd_scan(variables, x):
        def body(acc, i):
            out = bundle.apply(variables, x + acc * 0, training=False)
            return acc + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(steps))
        return acc

    step_fn, opt = make_train_step(bundle, jit=False)
    state = init_state(bundle, jax.random.PRNGKey(2), opt)

    @jax.jit
    def step_scan(state, x, y):
        def body(s, k):
            s, m = step_fn(s, (x, y), k)
            return s, m['loss']
        keys = jax.random.split(jax.random.PRNGKey(3), steps)
        s, losses = jax.lax.scan(body, state, keys)
        return jnp.sum(losses)

    fused, opt2 = make_fused_train_step(bundle, cfg, mesh=None,
                                        steps_per_call=steps)
    # the fused step donates its TrainState: thread it through repeats
    fcell = [init_state(bundle, jax.random.PRNGKey(4), opt2)]

    def fused_consume(banks, key):
        s, m = fused(fcell[0], banks, key)
        fcell[0] = s
        return m['loss']

    print(f'batch={batch} n_frame={n_frame} bf16, scan of {steps}, '
          f'backend={jax.default_backend()}', flush=True)
    print(f'{"stage":28s} {"ms":>9s} {"TFLOP":>8s} {"TF/s":>7s} '
          f'{"GB":>7s} {"GB/s":>7s}', flush=True)

    def emit(name, t, f, by):
        print(f'{name:28s} {t * 1e3:9.2f} {f / 1e12:8.3f} '
              f'{f / t / 1e12:7.1f} {by / 1e9:7.2f} {by / t / 1e9:7.1f}',
              flush=True)

    t = timed('features', feat_scan, key) / steps
    f, by = cost(feat_scan, key)
    emit('features(synth+mel+aug)', t, f / steps, by / steps)

    t = timed('fwd', fwd_scan, variables, x0) / steps
    f, by = cost(fwd_scan, variables, x0)
    emit('forward only', t, f / steps, by / steps)

    t = timed('step', step_scan, state, x0, y0) / steps
    f, by = cost(step_scan, state, x0, y0)
    emit('fwd+bwd+AGC+adam', t, f / steps, by / steps)

    t = timed('fused', fused_consume, banks, key) / steps
    emit('FULL fused step', t, 0, 0)


if __name__ == '__main__':
    main()
