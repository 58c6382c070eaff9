"""Decompose the synthesis kernel's time between DMA and VPU on hardware.

Round-3 NOTES estimated a ~1.8 ms HBM-byte floor vs ~4.3 ms measured at
B=512 and BLAMED the per-active-clip roll+accumulate VPU serialization on
paper; the round-4 verdict asked for a MEASURED kernel-level decomposition.
This probe times the full fused-magnitude pipeline program three ways in
separate subprocesses (the probe knob is compile-time):

  full           — the real kernel
  no_roll        — per-clip accumulate without the sub-tile roll
  no_accumulate  — every DMA still issued/waited, no VPU accumulate at all

full - no_accumulate  = the per-clip VPU (roll + read-modify-write) cost
full - no_roll        = the roll's share of it

Outputs are numerically WRONG for the two probe modes (measurement only).

Usage: python scripts/synth_bound_probe.py [batch]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = sys.argv[1] if len(sys.argv) > 1 else '512'
    here = os.path.dirname(os.path.abspath(__file__))
    for mode in ('', 'no_roll', 'no_accumulate'):
        env = dict(os.environ, CHALLENGE_TPU_SYNTH_PROBE=mode)
        label = mode or 'full'
        res = subprocess.run(
            [sys.executable, os.path.join(here, 'kernel_probe.py'),
             batch, label],
            capture_output=True, text=True, timeout=1200, env=env)
        line = [ln for ln in res.stdout.splitlines() if 'clips/s' in ln]
        print(line[-1] if line else f'{label}: FAILED\n{res.stderr[-500:]}',
              flush=True)


if __name__ == '__main__':
    main()
