"""Measure what Config.remat buys on real hardware: the largest fused
vad-v8 train batch that compiles+runs, with and without rematerialization,
and the per-clip time at each point (numbers recorded in NOTES.md).

Usage: PALLAS_AXON_REMOTE_COMPILE=1 python scripts/remat_probe.py [B ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_banks(n_frame=512):
    import bench
    from challenge_tpu.data.pipeline import build_banks
    bgs, voices, labels, noises = bench.make_data(n_frame)
    return build_banks(bgs, voices, labels, noises, n_frame=n_frame)


def probe(banks, batch_size, remat, n_frame=512, steps_per_call=5,
          model='vad', v=8):
    import bench
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_model

    cfg = Config(model_type=model, v=v, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch_size,
                 compute_dtype='bfloat16', remat=remat)
    return bench.time_fused_step(cfg, get_model(cfg), banks,
                                 steps_per_call=steps_per_call, repeats=2)


def main():
    model, v = os.environ.get('PROBE_MODEL', 'vad:8').split(':')
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048]
    banks = make_banks()
    for b in sizes:
        for remat in (False, True):
            tag = f'{model} v{v} B={b:<5} remat={remat!s:<5}'
            try:
                step_s = probe(banks, b, remat, model=model, v=int(v))
                print(f'{tag} {step_s * 1e3:8.2f} ms/step '
                      f'{step_s * 1e6 / b:7.1f} us/clip', flush=True)
            except Exception as e:
                msg = str(e).split('\n')[0][:120]
                print(f'{tag} FAILED: {msg}', flush=True)


if __name__ == '__main__':
    main()
