"""XLA/libtpu compiler-option sweep on the fused train step.

The conv stack is ~73% of the vad-v8 step at ~50% MXU efficiency; nothing
hand-written beat XLA's conv emitter in round 2, so this sweeps the
compiler's own knobs on the B=128 bf16 fused step and records a table for
NOTES.md.

The axon client's XLA build rejects every ``--xla_tpu_*`` flag in XLA_FLAGS
(those flags live in libtpu, which only the remote compile server loads),
but per-compile ``compiler_options`` serialize into the compile request and
ARE validated/applied server-side — so the sweep lowers the fused step once
and compiles it once per option set. Unknown options are recorded as
'rejected'.

Usage: python scripts/flag_sweep.py
"""

import json
import os
import sys
import time

CONFIGS = [
    ('baseline', {}),
    ('vmem_32m', {'xla_tpu_scoped_vmem_limit_kib': '32768'}),
    ('vmem_64m', {'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('vmem_96m', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('latency_hiding_off',
     {'xla_tpu_enable_latency_hiding_scheduler': 'false'}),
    ('licm_2x', {'xla_tpu_licm_size_inflation_ratio': '2.0'}),
    ('rwb_fusion_off', {'xla_tpu_rwb_fusion': 'false'}),
    ('dot_strength_reduction_off',
     {'xla_tpu_enable_dot_strength_reduction': 'false'}),
    ('conv_input_fusion_off', {'xla_jf_conv_input_fusion': 'false'}),
    ('bf16_fused_reducers', {'xla_tpu_use_bf16_for_fused_reducers': 'true'}),
    ('vector_load_fusion_off', {'xla_tpu_vector_load_fusion': 'false'}),
    ('aggressive_opt', {'xla_tpu_scoped_vmem_limit_kib': '65536',
                        'xla_tpu_licm_size_inflation_ratio': '2.0'}),
]

BATCH, N_FRAME, STEPS = 128, 512, 20


def main():
    import numpy as np
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_data
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.models import get_model
    from challenge_tpu.parallel import make_fused_train_step
    from challenge_tpu.train import init_state

    bgs, voices, labels, noises = make_data(N_FRAME)
    banks = build_banks(bgs, voices, labels, noises, n_frame=N_FRAME)
    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=N_FRAME,
                 n_chan=2, batch_size=BATCH, compute_dtype='bfloat16')
    bundle = get_model(cfg)
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None,
                                       steps_per_call=STEPS)
    state0 = init_state(bundle, jax.random.PRNGKey(0), opt)
    lowered = fused.lower(state0, banks, jax.random.PRNGKey(1))

    rows = []
    for name, opts in CONFIGS:
        t0 = time.time()
        try:
            compiled = lowered.compile(
                compiler_options=opts if opts else None)
        except Exception as e:
            msg = repr(e)
            rows.append((name, opts, 'rejected'
                         if 'No such' in msg or 'Unknown' in msg
                         or 'exit code 1' in msg else f'error', None))
            print(f'{name}: compile rejected/failed ({msg[:120]})',
                  flush=True)
            continue
        state = init_state(bundle, jax.random.PRNGKey(0), opt)
        state, metrics = compiled(state, banks, jax.random.PRNGKey(2))
        jax.block_until_ready(metrics)
        best = float('inf')
        for r in range(3):
            t1 = time.perf_counter()
            state, metrics = compiled(state, banks,
                                      jax.random.PRNGKey(3 + r))
            jax.block_until_ready(metrics)
            best = min(best, time.perf_counter() - t1)
        assert np.isfinite(float(metrics['loss']))
        ms = best / STEPS * 1e3
        rows.append((name, opts, round(ms, 3),
                     round(BATCH * STEPS / best, 1)))
        print(f'{name}: {ms:.3f} ms/step '
              f'(compile+run {time.time()-t0:.0f}s)', flush=True)

    print('\n| config | compiler_options | step ms (B=128) | clips/s |')
    print('|---|---|---|---|')
    for name, opts, ms, cps in rows:
        o = ', '.join(f'{k}={v}' for k, v in opts.items()) or '(none)'
        print(f'| {name} | `{o}` | {ms} | {cps or ""} |')
    print(json.dumps([{'name': n, 'step_ms': m, 'clips_per_sec': c}
                      for n, _, m, c in rows]))


if __name__ == '__main__':
    main()
