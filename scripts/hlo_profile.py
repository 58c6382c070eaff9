"""Per-HLO-op time attribution for any family's fused train step.

Captures a jax.profiler trace of a few fused-step dispatches and parses the
Chrome-format ``*.trace.json.gz`` directly (the tensorboard_plugin_profile
converters are broken in this image — NOTES.md), aggregating device-lane
event durations by HLO op name. This is the tool behind the per-family
roofline tables in NOTES.md.

Usage: python scripts/hlo_profile.py [family_bench-config-name] [top_n]
       [steps_per_call]
Names: see scripts/family_bench.py CONFIGS (vad8_128, se9_64, eff0_128,
density_b0_12, ...). steps_per_call defaults to 5; pass 1 for the heavy
families (the scanned se9_64 program takes tens of minutes on the remote
compiler) — the printed ms/step is normalized by it either way.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_chrome_trace(logdir):
    """-> (events by pid-lane, pid -> process name) from the newest trace."""
    paths = sorted(glob.glob(os.path.join(logdir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f'no trace.json.gz under {logdir}')
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    events = trace['traceEvents']
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    return events, pid_names


def device_op_times(logdir):
    """Aggregate complete ('X') events on TPU device lanes by op name."""
    events, pid_names = parse_chrome_trace(logdir)
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r'TPU|/device:|Device', name or '')}
    if not device_pids:           # fall back: lanes that aren't python/host
        device_pids = {pid for pid, name in pid_names.items()
                       if name and 'python' not in name.lower()
                       and 'host' not in name.lower()}
    per_op = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        dur = float(e.get('dur', 0.0))        # us
        per_op[name] += dur
        counts[name] += 1
        total += dur
    return per_op, counts, total, {p: pid_names[p] for p in device_pids}


def classify(name):
    n = name.lower()
    for key, pat in [('conv', r'conv'), ('dot', r'dot|gemm|matmul'),
                     ('scatter', r'scatter'), ('gather', r'gather'),
                     ('reduce', r'reduce'), ('fusion', r'fusion|loop'),
                     ('copy', r'copy|transpose|bitcast'),
                     ('custom', r'custom-call|pallas'),
                     ('rng', r'rng'), ('while', r'while')]:
        if re.search(pat, n):
            return key
    return 'other'


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else 'vad8_128'
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax

    import bench
    from challenge_tpu.data.pipeline import build_banks
    from challenge_tpu.parallel import make_fused_train_step
    from challenge_tpu.train import init_state
    from family_bench import build

    cfg, bundle, variant, loss_fn = build(name)
    bgs, voices, labels, noises = bench.make_data(cfg.n_frame)
    banks = build_banks(bgs, voices, labels, noises, n_frame=cfg.n_frame)
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None,
                                       steps_per_call=steps, variant=variant,
                                       loss_fn=loss_fn)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state, m = fused(state, banks, jax.random.PRNGKey(1))   # compile+warm
    jax.block_until_ready(m['loss'])

    logdir = f'/tmp/hlo_trace_{name}'
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        state, m = fused(state, banks, jax.random.PRNGKey(2))
        jax.block_until_ready(m['loss'])

    per_op, counts, total, lanes = device_op_times(logdir)
    if total <= 0.0:
        raise SystemExit(f'{name}: no device-op time captured '
                         f'(lanes matched: {lanes}) — nothing to attribute')
    print(f'{name}: device lanes {lanes}')
    print(f'total device-op time: {total / 1e3:.2f} ms '
          f'({steps} scanned steps -> {total / steps / 1e3:.2f} ms/step)')
    by_class = collections.Counter()
    for op, dur in per_op.items():
        by_class[classify(op)] += dur
    print('\nby class (% of device-op time):')
    for cls, dur in by_class.most_common():
        print(f'  {cls:10s} {dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%')
    print(f'\ntop {top_n} ops:')
    for op, dur in per_op.most_common(top_n):
        print(f'  {dur / 1e3:9.3f} ms x{counts[op]:<4d} '
              f'{100 * dur / total:5.1f}%  {op[:110]}')


if __name__ == '__main__':
    main()
