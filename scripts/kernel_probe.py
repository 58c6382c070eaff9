"""Quick A/B probe for synthesis-kernel changes: times the bench pipeline
config (vad v8 shapes, B=512, n_chan=2, fused flat-magnitude path) with the
scan-of-30 methodology and prints clips/s best + median.

Usage: python scripts/kernel_probe.py [batch] [label] [bank_dtype]
"""

import sys

sys.path.insert(0, '/root/repo')

from bench import bench_pipeline, make_data  # noqa: E402
from challenge_tpu.data.pipeline import build_banks  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    label = sys.argv[2] if len(sys.argv) > 2 else 'probe'
    dtype = sys.argv[3] if len(sys.argv) > 3 else 'float32'
    n_frame = 512
    bgs, voices, labels, noises = make_data(n_frame)
    banks = build_banks(bgs, voices, labels, noises, n_frame=n_frame,
                        flat_dtype=dtype)
    best, med = bench_pipeline(banks, batch, n_frame)
    print(f'{label}: B={batch} {dtype} best={best:.0f} median={med:.0f} '
          'clips/s')


if __name__ == '__main__':
    main()
