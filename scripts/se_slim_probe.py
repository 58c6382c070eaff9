"""se_v9 slim-bank verification on real hardware (round-5 item: the
heaviest, most HBM-pressured family was excluded from the slim/int8
capacity win because its seperate_noise_voice targets took the XLA path).

Measures, at the family-bench se9_64 workload (B=64, n_frame=512, bf16
compute), fused train-step time and bank HBM for:
  * f32 resident banks (the round-4 configuration — baseline),
  * f32 slim banks (dense volume dropped; targets via the Pallas se path),
  * int8 slim banks (the full capacity stack).

Pass criterion from the verdict: slim must not regress step time > 2%.

Usage: PALLAS_AXON_REMOTE_COMPILE=1 python scripts/se_slim_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    import bench
    from challenge_tpu.data.pipeline import build_banks
    from family_bench import build

    cfg, bundle, variant, loss_fn = build('se9_64')
    bgs, voices, labels, noises = bench.make_data(cfg.n_frame)

    def bank_mb(bk):
        return sum(x.nbytes for x in jax.tree.leaves(bk)) / 1e6

    results = {}
    for name, kw in (
            ('f32_resident', dict()),
            ('f32_slim', dict(data_resident=False)),
            ('int8_slim', dict(flat_dtype='int8', data_resident=False))):
        banks = build_banks(bgs, voices, labels, noises,
                            n_frame=cfg.n_frame, **kw)
        mb = bank_mb(banks)
        s = bench.time_fused_step(cfg, bundle, banks, variant=variant,
                                  loss_fn=loss_fn, steps_per_call=5,
                                  repeats=3)
        results[name] = (s * 1e3, mb)
        print(f'{name:14s} step {s * 1e3:8.2f} ms   banks {mb:7.1f} MB',
              flush=True)
        del banks

    base_ms, base_mb = results['f32_resident']
    for name in ('f32_slim', 'int8_slim'):
        ms, mb = results[name]
        print(f'{name:14s} step delta {100 * (ms - base_ms) / base_ms:+.2f}% '
              f'  bank HBM {mb / base_mb:.3f}x of f32-resident', flush=True)


if __name__ == '__main__':
    main()
