"""XLA/libtpu flag sweep on the fused train step (VERDICT r2 item 5).

The conv stack is ~73% of the vad-v8 step at ~50% MXU efficiency; nothing
hand-written beat XLA's conv emitter in round 2, so this sweeps the
compiler's own knobs on the B=128 bf16 fused step and records a table for
NOTES.md.

Each config runs in a fresh subprocess (XLA flags are read at backend
init). A config whose flag is unknown to this XLA build, or that fails to
compile, is recorded as 'error'. Results print as a markdown table.

Usage:
    python scripts/flag_sweep.py            # run the sweep (parent)
    python scripts/flag_sweep.py --worker   # internal: one timed config
"""

import json
import os
import subprocess
import sys
import time

CONFIGS = [
    ('baseline', ''),
    ('vmem_16m', '--xla_tpu_scoped_vmem_limit_kib=16384'),
    ('vmem_32m', '--xla_tpu_scoped_vmem_limit_kib=32768'),
    ('vmem_64m', '--xla_tpu_scoped_vmem_limit_kib=65536'),
    ('vmem_96m', '--xla_tpu_scoped_vmem_limit_kib=98304'),
    ('no_latency_hiding', '--xla_tpu_enable_latency_hiding_scheduler=false'),
    ('fusion_cost_model',
     '--xla_tpu_use_enhanced_scheduling_model=true'),
    ('licm_2x', '--xla_tpu_licm_size_inflation_ratio=2.0'),
    ('rwb_fusion_off', '--xla_tpu_rwb_fusion=false'),
    ('bf16_sum_reducer', '--xla_tpu_use_bf16_for_fused_reducers=true'),
]


def worker():
    import numpy as np
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_data, bench_train_step
    from challenge_tpu.data.pipeline import build_banks

    n_frame = 512
    bgs, voices, labels, noises = make_data(n_frame)
    banks = build_banks(bgs, voices, labels, noises, n_frame=n_frame)
    cps, step_s = bench_train_step(banks, batch_size=128, n_frame=n_frame)
    print(json.dumps({'clips_per_sec': round(cps, 2),
                      'step_ms': round(step_s * 1e3, 3),
                      'backend': jax.default_backend()}))


def main():
    rows = []
    for name, flags in CONFIGS:
        env = dict(os.environ)
        base = env.get('XLA_FLAGS', '')
        env['XLA_FLAGS'] = (base + ' ' + flags).strip()
        # flag changes must not poison (or hit) the persistent compile cache
        env['CHALLENGE_TPU_NO_COMPILE_CACHE'] = '1'
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--worker'],
            env=env, capture_output=True, text=True, timeout=2400)
        wall = time.time() - t0
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ''
        try:
            data = json.loads(line)
            rows.append((name, flags, data['step_ms'],
                         data['clips_per_sec'], round(wall)))
            print(f'{name}: {data["step_ms"]} ms '
                  f'({data["clips_per_sec"]} clips/s)', flush=True)
        except Exception:
            tail = (proc.stderr or '')[-400:]
            rows.append((name, flags, None, None, round(wall)))
            print(f'{name}: ERROR rc={proc.returncode}\n{tail}', flush=True)

    print('\n| config | flags | step ms (B=128) | clips/s |')
    print('|---|---|---|---|')
    for name, flags, ms, cps, _ in rows:
        print(f'| {name} | `{flags or "(none)"}` | '
              f'{ms if ms is not None else "error"} | {cps or ""} |')


if __name__ == '__main__':
    if '--worker' in sys.argv:
        worker()
    else:
        main()
