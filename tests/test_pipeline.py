"""Mixture-synthesis and pipeline tests (reference: pipeline_test.py:13-74)
plus semantic checks on SNR scaling, overlap rejection, and label masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from challenge_tpu.data import (
    Banks, build_bank, make_pipeline, merge_complex_specs, sample_batch,
)

FREQ, CHAN, N_CLASSES = 257, 4, 30


def _rand_specs(rng, n, t_lo, t_hi):
    return [rng.randn(FREQ, rng.randint(t_lo, t_hi), CHAN).astype('float32')
            for _ in range(n)]


class TestMergeComplexSpecs:
    def test_output_shapes(self):
        n_frame, n_voices, n_noises = 10, 4, 2
        rng = np.random.RandomState(0)
        background = rng.randn(FREQ, 8, CHAN).astype('float32')
        voices = rng.randn(n_voices, FREQ, n_frame, CHAN).astype('float32')
        seq = rng.randint(1, n_frame, size=n_voices)
        m = (np.arange(n_frame)[None] < seq[:, None])
        voices *= m[:, None, :, None]
        labels = np.eye(N_CLASSES, dtype='float32')[
            rng.randint(1, n_frame, size=n_voices)]
        noises = rng.randn(n_noises, FREQ, n_frame, CHAN).astype('float32')

        spec, l = merge_complex_specs(
            jax.random.PRNGKey(0), background, (voices, labels), noises,
            n_frame=n_frame, n_classes=N_CLASSES)
        assert spec.shape == (FREQ, n_frame, CHAN)
        assert l.shape == (n_voices, n_frame, N_CLASSES)

    def test_background_only_when_no_voice_energy(self):
        """Zero voices/noises -> output is exactly a crop of the background."""
        n_frame = 6
        rng = np.random.RandomState(1)
        background = np.abs(rng.randn(FREQ, 12, CHAN)).astype('float32')
        voices = np.zeros((2, FREQ, 4, CHAN), 'float32')
        labels = np.eye(N_CLASSES, dtype='float32')[[1, 2]]
        spec, l = merge_complex_specs(
            jax.random.PRNGKey(3), background, (voices, labels), None,
            n_frame=n_frame, n_classes=N_CLASSES)
        spec = np.asarray(spec)
        # every output frame equals some background frame
        for j in range(n_frame):
            assert any(np.allclose(spec[:, j], background[:, t])
                       for t in range(12))
        assert np.asarray(l).sum() == 0  # zero-energy voices get no labels

    def test_label_matches_voice_energy(self):
        """Accepted voices mark exactly their non-zero frames."""
        n_frame = 16
        rng = np.random.RandomState(2)
        background = np.zeros((FREQ, n_frame, CHAN), 'float32')
        voices = np.zeros((2, FREQ, 8, CHAN), 'float32')
        voices[:, :, 2:6, :] = np.abs(rng.randn(2, FREQ, 4, CHAN))
        labels = np.eye(N_CLASSES, dtype='float32')[[3, 7]]

        for seed in range(10):
            spec, l = merge_complex_specs(
                jax.random.PRNGKey(seed), background, (voices, labels), None,
                n_frame=n_frame, n_classes=N_CLASSES, min_ratio=2 / 3)
            spec, l = np.asarray(spec), np.asarray(l)
            energy = (np.abs(spec).max(axis=(0, 2)) > 0)
            labeled = l.sum(axis=(0, 2)) > 0
            # labeled frames must be exactly the frames with voice energy
            np.testing.assert_array_equal(labeled, energy)

    def test_overlap_rejection(self):
        """Max simultaneous voice-label count stays < 2."""
        n_frame = 8
        background = np.zeros((FREQ, n_frame, CHAN), 'float32')
        voices = np.abs(np.random.RandomState(3).randn(
            5, FREQ, n_frame, CHAN)).astype('float32')
        labels = np.eye(N_CLASSES, dtype='float32')[[1, 1, 2, 3, 4]]
        for seed in range(10):
            _, l = merge_complex_specs(
                jax.random.PRNGKey(seed), background, (voices, labels), None,
                n_frame=n_frame, n_classes=N_CLASSES, min_ratio=0.0)
            per_frame = np.asarray(l).sum(axis=0)
            assert per_frame.max() < 2

    def test_separate_noise_voice_outputs(self):
        n_frame = 10
        rng = np.random.RandomState(4)
        background = rng.randn(FREQ, n_frame, CHAN).astype('float32')
        voices = np.abs(rng.randn(3, FREQ, 6, CHAN)).astype('float32')
        labels = np.eye(N_CLASSES, dtype='float32')[[1, 2, 3]]
        noises = rng.randn(2, FREQ, 6, CHAN).astype('float32')
        spec, (l, only_voice, only_noise) = merge_complex_specs(
            jax.random.PRNGKey(5), background, (voices, labels), noises,
            n_frame=n_frame, n_classes=N_CLASSES, seperate_noise_voice=True)
        np.testing.assert_allclose(
            np.asarray(spec), np.asarray(only_voice) + np.asarray(only_noise),
            atol=1e-4)


class TestMakePipeline:
    def test_end_to_end_shapes(self):
        n_frame = 30
        rng = np.random.RandomState(5)
        backgrounds = _rand_specs(rng, 30, 1, n_frame * 2)
        voices = _rand_specs(rng, 40, 1, max(n_frame // 2, 2))
        labels = np.eye(N_CLASSES, dtype='float32')[
            rng.randint(N_CLASSES, size=(40,))]
        noises = _rand_specs(rng, 50, 1, max(n_frame // 2, 2))

        pipeline = make_pipeline(backgrounds, voices, labels, noises,
                                 n_frame=n_frame, max_voices=4, max_noises=4,
                                 n_classes=N_CLASSES)
        for s, l in pipeline.take(3):
            assert s.shape == (FREQ, n_frame, CHAN)
            assert l.shape == (4, n_frame, N_CLASSES)


class TestSampleBatch:
    def _banks(self, rng, n_classes=3):
        backgrounds = _rand_specs(rng, 6, 20, 40)
        voices = [np.abs(s) for s in _rand_specs(rng, 8, 4, 12)]
        labels = np.eye(n_classes, dtype='float32')[
            rng.randint(n_classes, size=8)]
        noises = _rand_specs(rng, 5, 4, 12)
        return Banks(build_bank(backgrounds), build_bank(voices),
                     jnp.asarray(labels), build_bank(noises))

    def test_shapes_and_determinism(self):
        banks = self._banks(np.random.RandomState(6))
        spec, label = sample_batch(jax.random.PRNGKey(0), banks, 4, 32,
                                   n_classes=3, max_voices=5, max_noises=3)
        assert spec.shape == (4, FREQ, 32, CHAN)
        assert label.shape == (4, 5, 32, 3)
        spec2, label2 = sample_batch(jax.random.PRNGKey(0), banks, 4, 32,
                                     n_classes=3, max_voices=5, max_noises=3)
        np.testing.assert_array_equal(np.asarray(spec), np.asarray(spec2))
        np.testing.assert_array_equal(np.asarray(label), np.asarray(label2))

    def test_batches_differ_across_keys(self):
        banks = self._banks(np.random.RandomState(7))
        a, _ = sample_batch(jax.random.PRNGKey(1), banks, 2, 16)
        b, _ = sample_batch(jax.random.PRNGKey(2), banks, 2, 16)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_labels_within_bounds(self):
        banks = self._banks(np.random.RandomState(8))
        for seed in range(5):
            _, label = sample_batch(jax.random.PRNGKey(seed), banks, 4, 32,
                                    max_voices=6, max_noises=3)
            summed = np.asarray(label).sum(axis=1)  # over voices
            assert summed.max() < 2  # overlap rejection
            assert summed.min() >= 0


def test_build_bank_zero_length_item_does_not_crash():
    """Degenerate zero-frame spec in a wrap-tiled bank: build_bank guards
    the tail-sizing division like the kernel-side draw guards length."""
    rng = np.random.default_rng(0)
    specs = [rng.standard_normal((257, 40, 4)).astype('f4'),
             np.zeros((257, 0, 4), 'f4')]
    bank = build_bank(specs, wrap_frames=64)
    assert bank.contig_exact_frames == 64
    assert int(bank.lens[1]) == 0


def test_batch_random_merge_aug_independent_per_sample():
    """Training n_chan>3 channel mixing must draw one INDEPENDENT factor
    per sample like the reference's per-example tf.data map (regression:
    a plain batched random_merge_aug call broadcast ONE draw over the
    whole batch, correlating every sample's augmented channels)."""
    from challenge_tpu.ops.augment import (
        batch_random_merge_aug, random_merge_aug)
    x = jnp.broadcast_to(
        jnp.asarray(np.random.default_rng(0).standard_normal((9, 16, 4)),
                    jnp.float32), (4, 9, 16, 4))   # identical samples
    out = batch_random_merge_aug(6)(jax.random.PRNGKey(3), x)
    assert out.shape == (4, 9, 16, 12)
    aug = np.asarray(out[..., 2:6])       # the 4 augmented real channels
    # identical inputs -> any cross-sample difference proves independent
    # factor draws (the shared-draw bug made all rows equal)
    assert not np.allclose(aug[0], aug[1])
    assert not np.allclose(aug[1], aug[2])
    # each sample individually matches the unbatched augment with its key
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    one = np.asarray(random_merge_aug(6)(keys[2], x[2]))
    np.testing.assert_array_equal(np.asarray(out[2]), one)


def test_build_bank_t_max_truncation_clips_lens():
    """An explicit t_max truncates the stored data, so lens must clip with
    it (regression: raw lengths leaked through and desynchronized the
    placement math from the actual bank contents)."""
    rng = np.random.default_rng(1)
    specs = [rng.standard_normal((257, 150, 4)).astype('f4'),
             rng.standard_normal((257, 40, 4)).astype('f4')]
    bank = build_bank(specs, t_max=100)
    assert bank.data.shape[1] == 100
    assert int(bank.lens[0]) == 100 and int(bank.lens[1]) == 40
    assert bank.contig_exact_frames == 40


def test_sample_batch_se_targets_exact_at_low_snr():
    """only_voice must be the voice contributions accumulated from ZEROS
    (reference pipeline.py:37,82-83) — reconstructing it as spec - bg loses
    a quiet voice entirely to f32 cancellation against a loud background
    (regression: with bg ~1e4 and voices ~1e-4, (bg + v) - bg == 0)."""
    rng = np.random.default_rng(7)
    backgrounds = [np.full((FREQ, 30, CHAN), 1e4, 'f4') for _ in range(2)]
    voices = [np.abs(rng.standard_normal((FREQ, 8, CHAN))
                     ).astype('f4') * 1e-4 for _ in range(4)]
    labels = np.eye(3, dtype='f4')[rng.integers(0, 3, size=4)]
    banks = Banks(build_bank(backgrounds), build_bank(voices),
                  jnp.asarray(labels), None)
    from challenge_tpu.data.mixture import sample_batch
    spec, (label, only_voice, only_noise) = sample_batch(
        jax.random.PRNGKey(11), banks, 4, 16, n_classes=3, max_voices=3,
        max_noises=0, min_ratio=1.0, snr=0.0, seperate_noise_voice=True,
        layout='tfc')
    ov = np.asarray(only_voice)
    # the quiet voices survive in the separated target...
    assert 0 < ov.max() < 1.0, ov.max()
    # ...and no background leaks into it (bg rows are 1e4 everywhere)
    assert np.asarray(only_noise).max() >= 1e4
    # frames with no voice label carry exactly zero voice target
    lab_frames = np.asarray(label).sum(axis=(1, 3)) > 0       # [B, n_frame]
    assert np.all(ov[~lab_frames] == 0.0)


@pytest.mark.slow
def test_feature_fn_se_v9_pallas_matches_xla_and_slim_banks(monkeypatch):
    """The se_v9 feature chain (speech_enhancement_preprocess triple +
    label downsample) through the Pallas se path: f32 full banks must
    match the XLA chain on the same key, and slim int8 banks — the
    capacity configuration the CLI now enables for this heaviest family —
    must run the whole chain without the dense f32 volume."""
    import challenge_tpu.ops.pallas_synth as ps
    from challenge_tpu.config import Config
    from challenge_tpu.data.pipeline import build_banks, make_feature_fn
    orig = ps.synthesize_windows

    def interp(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ps, 'synthesize_windows', interp)

    rng = np.random.default_rng(23)
    srcs = ([rng.standard_normal((257, 94, 4)).astype('f4')
             for _ in range(3)],
            [np.abs(rng.standard_normal((257, 40, 4))).astype('f4')
             for _ in range(4)],
            rng.integers(0, 3, size=4),
            [rng.standard_normal((257, 20, 4)).astype('f4')
             for _ in range(3)])
    cfg = Config(model_type='se', v=9, n_frame=64, batch_size=4, n_chan=2)
    key = jax.random.PRNGKey(3)

    full = build_banks(*srcs, n_frame=64)
    x_pl, y_pl = make_feature_fn(cfg, training=True,
                                 use_pallas=True)(key, full)
    x_x, y_x = make_feature_fn(cfg, training=True,
                               use_pallas=False)(key, full)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_x),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(y_pl), jax.tree.leaves(y_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    slim = build_banks(*srcs, n_frame=64, flat_dtype='int8',
                       data_resident=False)
    assert slim.backgrounds.data is None
    x_q, y_q = make_feature_fn(cfg, training=True,
                               use_pallas=True)(key, slim)
    assert x_q.shape == x_x.shape
    assert all(np.isfinite(np.asarray(v, np.float32)).all()
               for v in jax.tree.leaves((x_q, y_q)))
    # labels ride the f32 pos_masks, so they stay bit-identical even
    # through quantized banks
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(y_q)[0]),
                                  np.asarray(jax.tree.leaves(y_x)[0]))
