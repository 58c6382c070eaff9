"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8; the analogue of the reference's
CPU-forced tests, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from _helpers import make_banks as _banks
from challenge_tpu.config import Config
from challenge_tpu.data.pipeline import build_banks
from challenge_tpu.models import get_model
from challenge_tpu.parallel import (
    make_fused_train_step, make_mesh, make_sharded_train_step, replicate,
    shard_batch)
from challenge_tpu.train import init_state


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_train_step_runs_and_matches_single():
    """The 8-way sharded step must produce the same loss as the single-device
    step on the same replicated inputs (psum-of-grads == full-batch grads)."""
    # sgd keeps the update linear in the gradients so the psum-vs-serial
    # reduction-order float noise stays at epsilon scale (adam's rsqrt would
    # amplify it at step 1)
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=8,
                 optimizer='sgd')
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    step, opt = make_sharded_train_step(bundle, mesh)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state = replicate(state, mesh)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 80, 64, 2)).astype('f4'))
    y = jnp.asarray((rng.uniform(size=(8, 2, 3)) > 0.7).astype('f4'))
    batch = shard_batch((x, y), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics['loss']))

    # single-device comparison
    from challenge_tpu.train import make_train_step
    sstep, sopt = make_train_step(bundle)
    sstate = init_state(bundle, jax.random.PRNGKey(0), sopt)
    s_new, s_metrics = sstep(sstate, (x, y), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(s_metrics['loss']), rtol=1e-5)
    # updated params agree (grad psum == full-batch grad)
    a = jax.tree.leaves(new_state.params)[0]
    b = jax.tree.leaves(s_new.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fused_train_step_multichip():
    """Synthesis + features + train step in ONE XLA program over the mesh."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=8, n_chan=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    fused, opt = make_fused_train_step(bundle, cfg, mesh)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    banks = replicate(_banks(), mesh)
    key = jax.random.PRNGKey(3)
    for i in range(2):
        key, k = jax.random.split(key)
        state, metrics = fused(state, banks, k)
    jax.block_until_ready(state)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2


@pytest.mark.slow
def test_fused_train_step_pallas_shard_map(monkeypatch):
    """The Pallas synthesis kernel survives under a mesh: shard_map runs one
    kernel per device over its local batch shard (interpret mode on the CPU
    mesh). VERDICT r1 weak #4."""
    import challenge_tpu.ops.pallas_synth as ps
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    # bg length 94 >= n_frame 64: pallas mode requires contiguous windows
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=16, n_chan=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    fused, opt = make_fused_train_step(bundle, cfg, mesh, use_pallas=True)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    banks = replicate(_banks(), mesh)
    state, metrics = fused(state, banks, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


@pytest.mark.slow
def test_fused_step_int8_slim_bank_sharded(monkeypatch):
    """The full capacity stack composes on a mesh: int8-quantized SLIM
    banks (no dense f32 volume), host-built, clip-axis-sharded via
    shard_banks, synthesized per device by the Pallas kernel under
    shard_map (interpret on the CPU mesh), driving a fused train step.
    flat_scale shards along the clip axis with its bank; the dropped data
    leaf never has to exist on any device."""
    import challenge_tpu.ops.pallas_synth as ps
    from challenge_tpu.parallel import shard_banks
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(0)
    n_frame = 64
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(8)],
        rng.integers(0, 3, size=8),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)],
        n_frame=n_frame, flat_dtype='int8', data_resident=False, host=True)
    assert isinstance(banks.voices.flat, np.ndarray)
    assert banks.voices.data is None

    cfg = Config(model_type='vad', v=3, n_frame=n_frame, batch_size=16,
                 n_chan=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    sb = shard_banks(banks, mesh)
    assert sb.voices.flat.dtype == jnp.int8 and sb.voices.data is None
    assert sb.voices.flat_scale.shape[0] == sb.voices.flat.shape[0]
    fused, opt = make_fused_train_step(bundle, cfg, mesh, use_pallas=True,
                                       bank_sharded=True)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    state, metrics = fused(state, sb, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_sharded_feature_fn_shards_batch_and_varies_per_device():
    """Per-device synthesis folds the mesh position into the key: shards draw
    different mixtures, and the output is sharded on the batch axis."""
    from challenge_tpu.parallel import make_sharded_feature_fn
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=16, n_chan=2)
    mesh = make_mesh(8)
    fn = make_sharded_feature_fn(cfg, mesh, training=False, use_pallas=False)
    banks = replicate(_banks(), mesh)
    x, y = jax.jit(fn)(jax.random.PRNGKey(0), banks)
    assert x.shape[0] == 16
    x = np.asarray(x)
    # per-device shards (2 samples each) must differ from their neighbors
    assert not np.allclose(x[0:2], x[2:4])
    # indivisible batch -> caller must fall back
    cfg_bad = Config(model_type='vad', v=3, n_frame=64, batch_size=12)
    assert make_sharded_feature_fn(cfg_bad, mesh) is None


@pytest.mark.slow
def test_fused_steps_per_call_scan():
    """steps_per_call>1 runs N optimizer steps in one dispatch."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2)
    bundle = get_model(cfg)
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None,
                                       steps_per_call=3)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state, metrics = fused(state, _banks(), jax.random.PRNGKey(1))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics['loss']))


@pytest.mark.slow
def test_grad_accum_matches_mean_of_microbatch_grads():
    """config.grad_accum=k: ONE optimizer step from the MEAN of k
    microbatch gradients (AGC and the optimizer see the same tensor a
    single big batch's mean-reduced loss would produce), with BatchNorm
    moving stats threaded sequentially through the microbatches. Pinned
    against a hand-rolled loop over make_grad_update with the fused
    step's exact key derivation (fold_in(k_data/k_model, j))."""
    from challenge_tpu.data.pipeline import make_feature_fn
    from challenge_tpu.train import make_grad_update

    # sgd keeps the update linear in the gradients (adam's rsqrt would
    # amplify scan-vs-loop float noise at step 1)
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2,
                 optimizer='sgd', grad_accum=3)
    bundle = get_model(cfg)
    banks = _banks()
    fused, opt = make_fused_train_step(bundle, cfg, mesh=None)
    state = init_state(bundle, jax.random.PRNGKey(0), opt)
    state, metrics = fused(state, banks, jax.random.PRNGKey(1))
    assert int(state.step) == 1  # k microbatches = ONE optimizer step
    assert np.isfinite(float(metrics['loss']))

    feat = make_feature_fn(cfg, training=True)
    grad_fn, update_fn, _ = make_grad_update(bundle, opt)
    grad_fn = jax.jit(grad_fn)
    expect = init_state(bundle, jax.random.PRNGKey(0), opt)
    k_data, k_model = jax.random.split(jax.random.PRNGKey(1))
    stats, grad_sum = expect.batch_stats, None
    losses = []
    for j in range(cfg.grad_accum):
        batch = feat(jax.random.fold_in(k_data, j), banks)
        g, stats, m = grad_fn(expect.params, stats, batch,
                              jax.random.fold_in(k_model, j))
        grad_sum = g if grad_sum is None else jax.tree.map(jnp.add,
                                                           grad_sum, g)
        losses.append(float(m['loss']))
    grads = jax.tree.map(lambda g: g / cfg.grad_accum, grad_sum)
    expect = jax.jit(update_fn)(expect, grads, stats)

    np.testing.assert_allclose(float(metrics['loss']), np.mean(losses),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(expect.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(expect.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_grad_accum_composes_with_mesh_and_steps_per_call():
    """grad_accum x steps_per_call x the DP mesh in one program: the scan
    of optimizer steps wraps the scan of microbatches, each microbatch
    synthesized per-device under shard_map."""
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=16,
                 n_chan=2, grad_accum=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    fused, opt = make_fused_train_step(bundle, cfg, mesh,
                                       steps_per_call=2)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    banks = replicate(_banks(), mesh)
    state, metrics = fused(state, banks, jax.random.PRNGKey(3))
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2  # 2 optimizer steps, 4 microbatches


def test_grad_accum_requires_fused_mode():
    """Iterator-mode TrainLoop cannot honor grad_accum — it must refuse
    loudly instead of silently training at 1/k the effective batch."""
    from challenge_tpu.train.loop import TrainLoop
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=2,
                 grad_accum=2)
    bundle = get_model(cfg)
    with pytest.raises(ValueError, match='grad_accum'):
        TrainLoop(bundle)


@pytest.mark.slow
def test_graft_entry_contract():
    """__graft_entry__.entry() must be jittable; dryrun_multichip must build
    and run an n-device training step."""
    import importlib.util
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        '__graft_entry__', os.path.join(repo, '__graft_entry__.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out)))
    mod.dryrun_multichip(8)


def test_shard_banks_pads_cyclically_and_splits():
    """shard_banks: clip axes padded to the device count by cyclic repeats
    (voice labels stay index-aligned), every leaf split into per-device
    blocks, static bank metadata preserved."""
    from challenge_tpu.parallel import shard_banks
    banks = _banks()   # 3 backgrounds, 4 voices, 3 noises
    mesh = make_mesh(8)
    sb = shard_banks(banks, mesh)
    for bank in (sb.backgrounds, sb.voices, sb.noises):
        assert bank.data.shape[0] == 8
        assert bank.data.addressable_shards[0].data.shape[0] == 1
        assert bank.lens.shape[0] == 8
    assert sb.voice_labels.shape[0] == 8
    # cyclic padding: item N+i repeats item i, labels aligned with voices
    np.testing.assert_array_equal(np.asarray(sb.voices.data[4]),
                                  np.asarray(banks.voices.data[0]))
    np.testing.assert_array_equal(np.asarray(sb.voice_labels[4]),
                                  np.asarray(banks.voice_labels[0]))
    np.testing.assert_array_equal(np.asarray(sb.backgrounds.data[3]),
                                  np.asarray(banks.backgrounds.data[0]))
    assert (sb.backgrounds.contig_exact_frames
            == banks.backgrounds.contig_exact_frames)


@pytest.mark.slow
def test_fused_train_step_bank_sharded():
    """Dataset sharded over the mesh (capacity scales with chips): each
    device synthesizes from its local bank shard; grads still psum into a
    replicated state."""
    from challenge_tpu.parallel import shard_banks
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=16, n_chan=2)
    bundle = get_model(cfg)
    mesh = make_mesh(8)
    fused, opt = make_fused_train_step(bundle, cfg, mesh, bank_sharded=True)
    state = replicate(init_state(bundle, jax.random.PRNGKey(0), opt), mesh)
    banks = shard_banks(_banks(), mesh)
    key = jax.random.PRNGKey(3)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, metrics = fused(state, banks, k)
    jax.block_until_ready(state)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 2

    # guard rails: bank sharding has no single-device or non-dividing
    # fallback (a global gather over a sharded bank would all-gather the
    # dataset)
    with pytest.raises(ValueError):
        make_fused_train_step(bundle, cfg, mesh=None, bank_sharded=True)
    cfg_bad = cfg.replace(batch_size=12)
    with pytest.raises(ValueError):
        make_fused_train_step(get_model(cfg_bad), cfg_bad, mesh,
                              bank_sharded=True)


def test_bank_sharded_one_device_mesh_matches_replicated():
    """On a 1-device mesh the local shard IS the whole bank: sharded and
    replicated banks must synthesize bit-identical batches for the same
    key (pins that sharding only changes placement, not the draw logic)."""
    from challenge_tpu.parallel import (
        make_sharded_feature_fn, shard_banks)
    cfg = Config(model_type='vad', v=3, n_frame=64, batch_size=4, n_chan=2)
    mesh1 = make_mesh(1)
    banks = _banks()
    key = jax.random.PRNGKey(11)
    fn_sh = make_sharded_feature_fn(cfg, mesh1, training=True,
                                    use_pallas=False, bank_sharded=True)
    fn_rep = make_sharded_feature_fn(cfg, mesh1, training=True,
                                     use_pallas=False, bank_sharded=False)
    x1, y1 = jax.jit(fn_sh)(key, shard_banks(banks, mesh1))
    x2, y2 = jax.jit(fn_rep)(key, replicate(banks, mesh1))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_fused_density_bank_sharded_infers_n_classes():
    """The fused path infers the one-hot width from the banks (30-class
    density labels ride the fused/sharded step without explicit plumbing)."""
    from challenge_tpu.parallel import (
        make_sharded_feature_fn, shard_banks)
    rng = np.random.default_rng(2)
    banks = build_banks(
        [rng.standard_normal((257, 94, 4)).astype('f4') for _ in range(3)],
        [rng.standard_normal((257, 40, 4)).astype('f4') for _ in range(4)],
        rng.integers(0, 30, size=4),
        [rng.standard_normal((257, 20, 4)).astype('f4') for _ in range(3)],
        n_classes=30)
    cfg = Config(model_type='eff', v=0, n_frame=256, batch_size=8, n_chan=2)
    mesh = make_mesh(8)
    fn = make_sharded_feature_fn(cfg, mesh, training=False,
                                 variant='density', use_pallas=False,
                                 bank_sharded=True)
    x, y = jax.jit(fn)(jax.random.PRNGKey(0), shard_banks(banks, mesh))
    assert y.shape[-1] == 30
    assert np.all(np.isfinite(np.asarray(y)))


def test_mesh_for_config_policy():
    """CLI mesh policy: all devices when the batch divides them, single
    device (None) otherwise or when n_devices=1."""
    from challenge_tpu.parallel import mesh_for_config
    assert mesh_for_config(Config(batch_size=16)).devices.size == 8
    assert mesh_for_config(Config(batch_size=12)) is None   # 12 % 8 != 0
    assert mesh_for_config(Config(batch_size=16, n_devices=1)) is None
    m4 = mesh_for_config(Config(batch_size=16, n_devices=4))
    assert m4.devices.size == 4


def test_mesh_for_config_bank_shard_guards():
    """--bank_shard must never be silently dropped: a batch that cannot
    divide the mesh fails loudly instead of replicating the full banks
    onto one chip (capacity feature -> likely OOM)."""
    from challenge_tpu.parallel import mesh_for_config
    with pytest.raises(ValueError):
        mesh_for_config(Config(batch_size=12, bank_shard=True))
    # without the flag the same config quietly falls back to single-device
    assert mesh_for_config(Config(batch_size=12)) is None
    # n_devices=1 cap with bank_shard on a multi-device host: also loud
    with pytest.raises(ValueError):
        mesh_for_config(Config(batch_size=8, n_devices=1, bank_shard=True))


def test_shard_banks_host_built_matches_device_built():
    """build_banks(host=True) -> shard_banks places each device's block
    directly from host RAM (this is what makes --bank_shard's capacity
    claim real: device-built banks materialize the full set on device 0
    first). Resulting sharded banks are bitwise identical to sharding
    device-built banks."""
    from challenge_tpu.parallel import shard_banks

    rng = np.random.default_rng(0)
    kw = dict(
        backgrounds=[rng.standard_normal((257, 94, 4)).astype('f4')
                     for _ in range(3)],
        voices=[rng.standard_normal((257, 40, 4)).astype('f4')
                for _ in range(4)],
        labels=rng.integers(0, 3, size=4),
        noises=[rng.standard_normal((257, 20, 4)).astype('f4')
                for _ in range(3)])
    host_banks = build_banks(host=True, **kw)
    # host mode keeps numpy leaves (no device commitment before sharding)
    assert isinstance(host_banks.voices.flat, np.ndarray)
    assert isinstance(host_banks.voice_labels, np.ndarray)

    mesh = make_mesh(8)
    sb_host = shard_banks(host_banks, mesh)
    sb_dev = shard_banks(build_banks(**kw), mesh)
    for a, b in zip(jax.tree.leaves(sb_host), jax.tree.leaves(sb_dev)):
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (sb_host.backgrounds.contig_exact_frames
            == sb_dev.backgrounds.contig_exact_frames)
