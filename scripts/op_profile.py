"""Per-op time attribution for the fused train step via jax.profiler.

Captures a trace of a few fused-step dispatches, then parses the xplane
protobuf with tensorboard_plugin_profile's converter to print the top ops
by self-time. Works wherever the backend exports device traces (TPU; on
the axon tunnel device traces may be host-side only — the tool prints
whatever planes exist).

Usage: python scripts/op_profile.py [batch] [steps_per_call]
"""

import glob
import os
import sys

import jax

sys.path.insert(0, '/root/repo')

from bench import make_data  # noqa: E402
from challenge_tpu.config import Config  # noqa: E402
from challenge_tpu.data.pipeline import build_banks  # noqa: E402
from challenge_tpu.models import get_model  # noqa: E402
from challenge_tpu.parallel import make_fused_train_step  # noqa: E402
from challenge_tpu.train import init_state  # noqa: E402


def top_ops_from_trace(logdir, n=40):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    xspaces = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                        recursive=True)
    if not xspaces:
        print('no xplane.pb captured'); return
    params = {'tqx': 'out:csv;'}
    try:
        data, _ = rtd.xspace_to_tool_data(xspaces, 'framework_op_stats', params)
    except Exception as e:
        print('framework_op_stats failed:', e)
        try:
            data, _ = rtd.xspace_to_tool_data(xspaces, 'hlo_op_stats^', params)
        except Exception as e2:
            print('hlo op stats failed too:', e2)
            return
    lines = data.splitlines() if isinstance(data, str) else [
        str(data)]
    for line in lines[:n + 1]:
        print(line[:240])


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_frame = 512
    cfg = Config(model_type='vad', v=8, n_mels=80, n_frame=n_frame,
                 n_chan=2, batch_size=batch, compute_dtype='bfloat16')
    bgs, voices, labels, noises = make_data(n_frame)
    banks = build_banks(bgs, voices, labels, noises)
    bundle = get_model(cfg)
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None,
                                       steps_per_call=steps)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state, m = fused(state, banks, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m)

    logdir = '/tmp/fused_step_trace'
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        for i in range(2):
            state, m = fused(state, banks, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m)
    top_ops_from_trace(logdir)


if __name__ == '__main__':
    main()
