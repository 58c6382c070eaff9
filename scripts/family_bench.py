"""Fused train-step timings across model families (scan methodology).

Reproduces the NOTES.md family table and adds the density trainer config
(reference trainer.py defaults: EfficientNet regression on density labels,
n_frame 2048, count+TV loss, AdaBelief).

Usage: PALLAS_AXON_REMOTE_COMPILE=1 python scripts/family_bench.py [name ...]
Names: vad8_128 | eff0_32 | eff0_128 | se9_8 | se9_64 |
       density_b0_12 | density_b4_12
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    'vad8_128': dict(model_type='vad', v=8, batch_size=128, n_frame=512),
    'eff0_32': dict(model_type='eff', v=1, model=0, batch_size=32,
                    n_frame=512),
    # hardware-native batch sizes (the 128-lane tiling saturates around
    # B=128 for conv stacks — NOTES.md train-step finding #2); the small-B
    # entries above stay as fixed-batch comparables
    'eff0_128': dict(model_type='eff', v=1, model=0, batch_size=128,
                     n_frame=512),
    'se9_8': dict(model_type='se', v=9, batch_size=8, n_frame=512),
    'se9_64': dict(model_type='se', v=9, batch_size=64, n_frame=512),
    'density_b0_12': dict(model_type='eff', v=0, model='EfficientNetB0',
                          batch_size=12, n_frame=2048, variant='density',
                          optimizer='adabelief', lr=1e-4, max_voices=10,
                          max_noises=6, snr=-15),
    'density_b4_12': dict(model_type='eff', v=0, model='EfficientNetB4',
                          batch_size=12, n_frame=2048, variant='density',
                          optimizer='adabelief', lr=1e-4, max_voices=10,
                          max_noises=6, snr=-15),
}


def build(name):
    """The SINGLE source of truth for a family workload: name ->
    (cfg, bundle, variant, loss_fn). Shared by this script's run(),
    bench.bench_family_steps (the BENCH JSON artifact) and
    scripts/hlo_profile.py, so every tool measures the same thing."""
    from challenge_tpu.config import Config
    from challenge_tpu.models import get_density_model, get_model
    from challenge_tpu.train.losses import density_loss

    kw = dict(CONFIGS[name])
    variant = kw.pop('variant', 'sj')
    cfg = Config(n_mels=80, n_chan=2, compute_dtype='bfloat16', **kw)
    if variant == 'density':
        bundle = get_density_model(cfg)
        base = density_loss(alpha=0.8, l2=1.0)   # reference trainer defaults
        loss_fn = lambda t, p: (base(t, p), {})  # noqa: E731
    else:
        bundle = get_model(cfg)
        loss_fn = None
    return cfg, bundle, variant, loss_fn


def run(name, steps_per_call=10, repeats=3):
    import bench
    from challenge_tpu.data.pipeline import build_banks

    cfg, bundle, variant, loss_fn = build(name)
    bgs, voices, labels, noises = bench.make_data(cfg.n_frame)
    banks = build_banks(bgs, voices, labels, noises, n_frame=cfg.n_frame)
    step_s = bench.time_fused_step(cfg, bundle, banks, variant=variant,
                                   loss_fn=loss_fn,
                                   steps_per_call=steps_per_call,
                                   repeats=repeats)
    print(f'{name:16s} {step_s * 1e3:8.2f} ms/step '
          f'{cfg.batch_size / step_s:8.1f} clips/s', flush=True)


def main():
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        try:
            run(name)
        except Exception as e:
            print(f'{name:16s} FAILED: {str(e).splitlines()[0][:120]}',
                  flush=True)


if __name__ == '__main__':
    main()
