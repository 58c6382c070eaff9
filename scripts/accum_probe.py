"""Measure what Config.grad_accum buys on real hardware: per-clip step
time at a big EFFECTIVE batch reached by accumulation vs the same batch
run natively (NOTES.md records that native vad-v8 B=1024 degrades ~2.4x
per-clip under HBM pressure; accumulation should hold the B<=512 rate).

Usage: PALLAS_AXON_REMOTE_COMPILE=1 python scripts/accum_probe.py \
           [B:accum ...]       (default points: 512:1 512:2 1024:1 256:4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(banks, batch_size, accum, steps_per_call=5):
    import bench
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_model

    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=512, n_chan=2,
                 batch_size=batch_size, compute_dtype='bfloat16',
                 grad_accum=accum)
    return bench.time_fused_step(cfg, get_model(cfg), banks,
                                 steps_per_call=steps_per_call, repeats=3)


def main():
    import bench
    from challenge_tpu.data.pipeline import build_banks

    points = []
    for arg in sys.argv[1:] or ['512:1', '512:2', '1024:1', '256:4']:
        b, a = arg.split(':')
        points.append((int(b), int(a)))

    bgs, voices, labels, noises = bench.make_data(512)
    banks = build_banks(bgs, voices, labels, noises, n_frame=512)
    for batch, accum in points:
        try:
            s = probe(banks, batch, accum)
        except Exception as e:  # OOM / compile failure is a data point
            print(f'B={batch} accum={accum}: FAILED '
                  f'({type(e).__name__}: {str(e)[:200]})', flush=True)
            continue
        eff = batch * accum
        print(f'B={batch} accum={accum} (effective {eff}): '
              f'{s * 1e3:.1f} ms/step, {s / eff * 1e3:.3f} ms/clip, '
              f'{eff / s:.0f} clips/s', flush=True)


if __name__ == '__main__':
    main()
