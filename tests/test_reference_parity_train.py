"""Differential parity vs the reference's training-machinery code
(/root/reference/utils.py is importable as-is — numpy/pickle/tf only;
adaptive_clip_grad and custom_loss are extracted from sj_train.py /
trainer.py source because those modules' imports need torchaudio).

Covers the train-side reimplementations the randomized metric/feature
differentials (test_reference_parity.py) do not: focal loss, the 30-dim
cos_sim, NFNet-style AGC, the count+TV density loss, and the from-scratch
AdaBelief recurrence (vs a numpy oracle transcribed from utils.py:170-236 —
the Keras-2 optimizer class itself cannot instantiate under Keras 3).
"""

import os
import re
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference not mounted')


@pytest.fixture(scope='module')
def tf():
    return pytest.importorskip('tensorflow')


@pytest.fixture(scope='module')
def ref_utils(tf):
    saved = sys.modules.pop('utils', None)
    sys.path.insert(0, REF)
    try:
        import utils as ref_utils  # noqa: reference module
    finally:
        sys.path.remove(REF)
        # don't leave the REFERENCE's 'utils' bound for later tests (the
        # repo-root shim of the same name must resolve fresh)
        sys.modules.pop('utils', None)
        if saved is not None:
            sys.modules['utils'] = saved
    return ref_utils


def _extract_def(path, name):
    """Cut one top-level ``def name(...)`` out of a reference source file."""
    src = open(path).read()
    m = re.search(rf'^def {name}\(.*?(?=^\S)', src, re.M | re.S)
    assert m, f'{name} not found in {path}'
    return m.group(0)


def test_focal_loss_differential(ref_utils, tf):
    rng = np.random.default_rng(0)
    y_true = (rng.random((8, 32, 3)) < 0.3).astype('f4')
    y_pred = rng.random((8, 32, 3)).astype('f4') * 0.98 + 0.01

    from challenge_tpu.train.losses import sigmoid_focal_crossentropy
    theirs = ref_utils.sigmoid_focal_crossentropy(
        tf.constant(y_true), tf.constant(y_pred)).numpy()
    # reference returns per-(batch, time) class-summed losses; ours applies
    # the Keras reduction (mean over batch and time) for model.compile parity
    ours = np.asarray(sigmoid_focal_crossentropy(
        jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(ours, np.mean(theirs), rtol=1e-5, atol=1e-6)


def test_cos_sim_30dim_differential(ref_utils, tf):
    """The trainer-variant cos_sim (trainer.py:192-198, over [B, T, 30])."""
    src = _extract_def(os.path.join(REF, 'trainer.py'), 'cos_sim')
    ns = {'tf': tf, 'safe_div': ref_utils.safe_div}
    exec(compile(src, 'ref_cos_sim.py', 'exec'), ns)

    from challenge_tpu.train.metrics import cos_sim
    rng = np.random.default_rng(1)
    y_true = (rng.random((4, 16, 30)) < 0.2).astype('f4')
    y_pred = rng.random((4, 16, 30)).astype('f4')
    theirs = ns['cos_sim'](tf.constant(y_true), tf.constant(y_pred)).numpy()
    ours = np.asarray(cos_sim(jnp.asarray(y_true), jnp.asarray(y_pred)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_agc_differential(ref_utils, tf):
    """adaptive_clip_grad (sj_train.py:145-155) on random param/grad lists."""
    src = _extract_def(os.path.join(REF, 'sj_train.py'),
                       'adaptive_clip_grad')
    ns = {'tf': tf, 'unitwise_norm': ref_utils.unitwise_norm,
          'compute_norm': ref_utils.compute_norm}
    exec(compile(src, 'ref_agc.py', 'exec'), ns)
    ref_agc = ns['adaptive_clip_grad']

    from challenge_tpu.train.optim import adaptive_clip_grad
    rng = np.random.default_rng(2)
    shapes = [(5,), (3, 7), (4, 4), (3, 3, 2, 6)]
    params = [rng.standard_normal(s).astype('f4') for s in shapes]
    # mix of tiny and huge grads so both clip branches fire
    grads = [rng.standard_normal(s).astype('f4') * scale
             for s, scale in zip(shapes, (1e-4, 10.0, 1e-4, 10.0))]

    theirs = [g.numpy() for g in ref_agc(
        [tf.constant(p) for p in params], [tf.constant(g) for g in grads])]
    ours = adaptive_clip_grad([jnp.asarray(p) for p in params],
                              [jnp.asarray(g) for g in grads])
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t, rtol=1e-5, atol=1e-7)


def test_density_loss_differential(ref_utils, tf):
    """custom_loss count+TV (trainer.py:144-189) on random density labels."""
    src = _extract_def(os.path.join(REF, 'trainer.py'), 'custom_loss')
    ns = {'tf': tf, 'safe_div': ref_utils.safe_div}
    exec(compile(src, 'ref_custom_loss.py', 'exec'), ns)
    ref_loss = ns['custom_loss'](alpha=0.8, l2=1.0)

    from challenge_tpu.train.losses import density_loss
    rng = np.random.default_rng(3)
    y_true = rng.random((6, 20, 30)).astype('f4') * \
        (rng.random((6, 20, 30)) < 0.3)
    y_pred = rng.random((6, 20, 30)).astype('f4')
    theirs = ref_loss(tf.constant(y_true), tf.constant(y_pred)).numpy()
    ours = density_loss(alpha=0.8, l2=1.0)(
        jnp.asarray(y_true), jnp.asarray(y_pred))
    ours_val = ours[0] if isinstance(ours, tuple) else ours
    np.testing.assert_allclose(np.asarray(ours_val), np.mean(theirs),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('name', ['adam', 'sgd', 'rmsprop'])
def test_keras_optimizer_differential(tf, name):
    """make_optimizer vs the actual tf.keras optimizer the reference
    compiles (sj_train.py:434-442), including clipvalue and an LR change
    mid-run — the LR rides INSIDE the Keras SGD/RMSprop momentum buffers
    and Adam adds eps outside the bias correction, both of which the stock
    optax stacks get wrong (see optim.py)."""
    import optax

    from challenge_tpu.config import Config
    from challenge_tpu.train.optim import make_optimizer, set_learning_rate

    rng = np.random.default_rng(5)
    x0 = rng.standard_normal(6).astype('f4')
    # scales straddling clipvalue=0.01 so elementwise clipping fires, and
    # near-zero-variance steps where the Adam eps placement shows
    grads = [(rng.standard_normal(6) * s).astype('f4')
             for s in (2e-3, 5e-2, 1e-4, 3e-3, 2e-2, 1e-3)]
    lrs = [1e-2] * 3 + [4e-3] * 3   # mid-run LR change (epoch boundary)

    cfg = Config(optimizer=name, lr=lrs[0], clipvalue=0.01)
    opt = make_optimizer(cfg)
    params = jnp.asarray(x0)
    state = opt.init(params)
    for g, lr in zip(grads, lrs):
        state = set_learning_rate(state, lr)
        upd, state = opt.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, upd)

    kwargs = dict(clipvalue=0.01)
    if name in ('sgd', 'rmsprop'):
        kwargs['momentum'] = 0.9          # reference: sj_train.py:436-439
    if name in ('adam', 'rmsprop'):
        kwargs['epsilon'] = 1e-7
    keras_opt = {'adam': tf.keras.optimizers.Adam,
                 'sgd': tf.keras.optimizers.SGD,
                 'rmsprop': tf.keras.optimizers.RMSprop}[name](lrs[0],
                                                               **kwargs)
    var = tf.Variable(x0)
    for g, lr in zip(grads, lrs):
        keras_opt.learning_rate.assign(lr)
        keras_opt.apply_gradients([(tf.constant(g), var)])

    np.testing.assert_allclose(np.asarray(params), var.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adabelief_vs_numpy_oracle():
    """optax scale_by_adabelief vs the reference recurrence transcribed to
    numpy (utils.py:170-236): m/v EMAs with belief variance (g - m_t)^2,
    lr scaled by sqrt(1-b2^t)/(1-b1^t), eps OUTSIDE the sqrt."""
    from challenge_tpu.train.optim import scale_by_adabelief
    b1, b2, eps, steps = 0.9, 0.999, 1e-7, 12
    rng = np.random.default_rng(4)
    grads = [rng.standard_normal((3, 4)).astype('f4') for _ in range(steps)]

    m = v = np.zeros((3, 4), np.float64)
    oracle_updates = []
    for t, g in enumerate(grads, start=1):
        g = g.astype(np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g - m) ** 2
        corr = np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        oracle_updates.append(corr * m / (np.sqrt(v) + eps))

    opt = scale_by_adabelief(b1=b1, b2=b2, eps=eps)
    state = opt.init(jnp.zeros((3, 4)))
    for g, want in zip(grads, oracle_updates):
        upd, state = opt.update(jnp.asarray(g), state)
        np.testing.assert_allclose(np.asarray(upd), want,
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_trained_quality_head_to_head():
    """THE capability the reference exists for, measured head to head: both
    stacks train end to end on one shared synthetic corpus (identical spec
    arrays, identical recipe — adam + clipvalue, BCE, constant lr, same
    epochs/steps/batch/snr/max_voices) and each scores its final weights
    through its OWN challenge-eval chain on the same dev set
    (ours: challenge_tpu.evaluate; theirs: /root/reference/metrics.py:31-90
    after a sj_train.py-shaped fit). Pre-registered pass criteria
    (calibrated round 5; every measured number in NOTES.md):

      * our stack genuinely learns at the pinned loop seed (f1 > 0.3,
        loss < 0.42 — the all-zero optimum sits at ~0.46/f1 0);
      * the reference genuinely learns on its best of <= 6 tf seeds
        (f1 > 0.2, loss < 0.42) — measured: ~half of seeds collapse at
        this 350-step scale on BOTH stacks symmetrically (ours loop seed
        1: f1 0.0; theirs tf seed 1: f1 0.057), so the reference gets its
        best shot, which is conservative for OUR side of the comparison;
        if every attempt collapses (~2% at the measured rate — TF
        threading makes even a fixed seed non-reproducible) the test
        SKIPS with the attempts on record: a collapsed reference scores
        ~1.0 and the comparison would be trivially easy for our side;
      * our trained mean DEV challenge ER <= the reference's successful
        run's + 0.2 — the official score; this dev set quantizes ER in
        ~0.09 steps (one merged event) and the 2 s max-pool merges
        adjacent events equally on both stacks, so 0.2 = two quanta.
        Measured at calibration: ours 0.912 vs theirs 0.823.

    The validation-window ER is recorded but NOT asserted: measured
    trajectories show it mid-transient at 14 epochs (1.0 for ten epochs,
    then swinging 1.0-1.7 epoch to epoch on both stacks) — it cannot
    discriminate at this scale.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    try:
        from ref_head_to_head import run
        out = run(epochs=14, steps=25, seed=0)
    finally:
        sys.path.pop(0)

    ours, ref = out['ours'], out['reference']
    assert np.isfinite(ours['trained_er']).all(), ours
    assert np.isfinite(ref['trained_er']).all(), ref
    assert np.isfinite(ours['final_val_er']), ours   # recorded, see above
    # our stack genuinely trained at the pinned seed
    assert ours['final_loss'] < 0.42, ours
    assert ours['final_f1'] > 0.3, ours
    # the reference must genuinely train for the comparison to mean
    # anything (a collapsed reference scores ~1.0 and our trained 0.91
    # would 'win' trivially). Its TF threading is non-reproducible, so
    # the same seeds can all collapse in one run and pass in another
    # (observed once across 6x350-step attempts at the measured ~1/2
    # per-seed collapse rate, ~2% for all six): that is a property of
    # the reference stack at this scale, not evidence about ours — skip
    # rather than fail, with the attempts on record.
    if ref['final_f1'] <= 0.2:
        pytest.skip('reference collapsed on all '
                    f'{len(out["ref_attempts"])} tf seeds this run '
                    f'(best f1 {ref["final_f1"]:.3f}); comparison '
                    f'undefined — attempts: {out["ref_attempts"]}')
    assert ref['final_loss'] < 0.42, (ref, out['ref_attempts'])
    # head-to-head, dev challenge ER (the official score)
    assert out['ours_trained_mean'] <= out['ref_trained_mean'] + 0.2, out
