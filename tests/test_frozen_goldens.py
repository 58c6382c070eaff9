"""Frozen-PRNG golden tests: pin OUR random streams so a future RNG-order
refactor (key split order, mask formulation, synthesis draw order) cannot
silently change the training data distribution.

The reference pins its augmentations with tf.random.set_seed goldens
(transforms_test.py:10-43); TF streams are not reproducible in JAX, so these
are the JAX-native equivalent: exact outputs under fixed jax.random keys,
generated once and hard-coded. jax's threefry PRNG is backend-independent,
so these hold on CPU and TPU alike.
"""

import jax
import jax.numpy as jnp
import numpy as np

from _helpers import make_banks as _banks
from challenge_tpu.data.mixture import sample_batch
from challenge_tpu.ops.augment import batch_mask, mask

MASK_AXIS1_KEY2020 = np.array([1, 1, 0, 0, 0, 0, 0, 1, 1, 1])
MASK_AXIS0_KEY100 = np.array([1, 1, 1, 0, 0, 1])
BATCH_MASK_KEY7 = np.array([[1, 1, 0, 0, 0, 0, 1, 1],
                            [1, 1, 0, 0, 1, 1, 1, 1],
                            [1, 1, 1, 1, 1, 1, 1, 1]])


def test_mask_frozen_time_axis():
    x = jnp.ones((6, 10), jnp.float32)
    out = np.asarray(mask(jax.random.PRNGKey(2020), x, axis=1,
                          max_mask_size=5, n_mask=2))
    np.testing.assert_array_equal(
        out, np.broadcast_to(MASK_AXIS1_KEY2020, (6, 10)))


def test_mask_frozen_freq_axis():
    x = jnp.ones((6, 10), jnp.float32)
    out = np.asarray(mask(jax.random.PRNGKey(100), x, axis=0,
                          max_mask_size=4, n_mask=1))
    np.testing.assert_array_equal(
        out, np.broadcast_to(MASK_AXIS0_KEY100[:, None], (6, 10)))


def test_batch_mask_frozen():
    x = jnp.ones((3, 4, 8), jnp.float32)
    out = np.asarray(batch_mask(jax.random.PRNGKey(7), x, axis=-1,
                                max_mask_size=5, n_mask=2))
    np.testing.assert_array_equal(
        out, np.broadcast_to(BATCH_MASK_KEY7[:, None, :], (3, 4, 8)))


def test_sample_batch_frozen():
    """Synthesis under PRNGKey(42): exact checksums and spot values pinned
    (XLA scatter path; the Pallas kernel is asserted bit-equal to it on
    device by bench.py and in interpret mode by test_pallas_synth)."""
    spec, y = sample_batch(jax.random.PRNGKey(42), _banks(), 4, 64,
                           n_classes=3, max_voices=3, max_noises=2,
                           min_ratio=1.0, snr=-20, use_pallas=False)
    spec, y = np.asarray(spec), np.asarray(y)
    assert spec.shape == (4, 257, 64, 4) and y.shape == (4, 3, 64, 3)
    # regenerated 2026-08-16 when source draws moved from iid-with-replacement
    # to the reference's without-replacement permutation streams (_stream_draw)
    np.testing.assert_allclose(
        spec.sum(axis=(1, 2, 3)),
        [248.66588, 259.28943, -14.981104, 13.060882], rtol=1e-4)
    np.testing.assert_allclose(np.abs(spec).sum(), 218841.39, rtol=1e-4)
    np.testing.assert_allclose(y.sum(axis=(1, 2, 3)), [40., 40., 40., 40.])
    np.testing.assert_allclose(
        spec[0, 100, 10], [1.3853714, 0.1459848, 0.6170903, 1.8281239],
        rtol=1e-4)
    np.testing.assert_allclose(
        spec[2, 50, 32], [-0.29370502, 0.12233976, 0.85793906, -0.3260277],
        rtol=1e-4)
