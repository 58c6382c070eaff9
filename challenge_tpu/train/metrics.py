"""In-graph training metrics (reference: metrics.py:217-298).

The reference's ``er_score`` builds variable-length event lists with
``tf.where`` + sorting; that is not expressible with static shapes, so the
TPU version computes the identical quantity with cumulative ops:

* events of a 0/1 frame sequence are (start, end) runs; an end at frame ``e``
  pairs with the latest start ``s <= e`` (a cummax);
* a prediction "hits" a true event iff some predicted-event midpoint
  ``m = (s_p + e_p) // 2`` with the same (batch, class) lies in
  ``[s_t, e_t]`` — counted by scattering midpoints into a frame grid and
  differencing its cumsum (reference: metrics.py:256-266);
* score = (n_true + n_pred - 2 * hits) / max(n_true, 1) per sample
  (reference: metrics.py:271-273).

Everything is fixed-shape, fully jittable, and fuses into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from challenge_tpu.models.layers import avg_pool_same
from challenge_tpu.ops.norms import safe_div


def _starts_ends(y):
    """Run starts/ends of a 0/1 sequence [B, T, C] (reference:
    metrics.py:229-246): start at t iff y[t]=1 and y[t-1]=0; end at t iff
    y[t]=1 and y[t+1]=0 (t is the run's last frame)."""
    y = y.astype(jnp.float32)
    prev = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    nxt = jnp.pad(y, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    return jnp.clip(y - prev, 0, 1), jnp.clip(y - nxt, 0, 1)


def _last_start_index(starts):
    """Per (b, c): latest start frame <= t, or -1 (a time-axis cummax)."""
    t_idx = jnp.arange(starts.shape[1])[None, :, None]
    marked = jnp.where(starts > 0, t_idx, -1)
    return jax.lax.cummax(marked, axis=1)


def er_score(threshold: float = 0.5, smoothing: bool = True):
    """Batched in-graph challenge error rate (reference: metrics.py:217-274).

    With ``smoothing`` the prediction is 0.5 s average-pooled with the Keras
    default stride (= pool size, i.e. downsampled x31) before thresholding —
    the reference's exact (scale-mixing) behavior is preserved.
    """
    def er(y_true, y_pred):
        y_true = (y_true >= threshold).astype(jnp.float32)
        if smoothing:
            k = int(0.5 * 16000) // 256
            y_pred = avg_pool_same(y_pred, (k,), (k,))
        y_pred = (y_pred >= threshold).astype(jnp.float32)

        t_starts, t_ends = _starts_ends(y_true)
        p_starts, p_ends = _starts_ends(y_pred)
        n_true = jnp.sum(t_starts, axis=(1, 2))
        n_pred = jnp.sum(p_starts, axis=(1, 2))

        b, tp, c = y_pred.shape
        # predicted-event midpoints scattered onto the pred frame grid
        p_ls = _last_start_index(p_starts)
        t_idx = jnp.arange(tp)[None, :, None]
        mid = jnp.clip((p_ls + t_idx) // 2, 0, tp - 1)
        b_idx = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, tp, c))
        c_idx = jnp.broadcast_to(jnp.arange(c)[None, None, :], (b, tp, c))
        mid_grid = jnp.zeros((b, tp, c)).at[
            b_idx, mid, c_idx].add(p_ends)
        cum = jnp.cumsum(mid_grid, axis=1)            # [B, Tp, C]

        # for each true event (end at e, start at s): any midpoint in [s, e]?
        tt = y_true.shape[1]
        t_ls = _last_start_index(t_starts)            # [B, Tt, C]
        e_idx = jnp.arange(tt)[None, :, None]
        hi = jnp.clip(jnp.broadcast_to(e_idx, t_ls.shape), 0, tp - 1)
        lo = jnp.clip(t_ls - 1, 0, tp - 1)
        bb = jnp.broadcast_to(jnp.arange(b)[:, None, None], t_ls.shape)
        cc = jnp.broadcast_to(jnp.arange(c)[None, None, :], t_ls.shape)
        upper = cum[bb, hi, cc]
        lower = jnp.where(t_ls > 0, cum[bb, lo, cc], 0.0)
        # out-of-range true windows (start beyond pred length) count zero
        lower = jnp.where(t_ls <= tp - 1, lower, upper)
        hit = ((upper - lower) >= 1.0).astype(jnp.float32) * t_ends
        correct = jnp.sum(hit, axis=(1, 2))

        score = n_true + n_pred - 2.0 * correct
        return score / jnp.clip(n_true, 1.0, max(float(tt), 1.0) * c)
    return er


def cos_sim(y_true, y_pred):
    """Masked negative cosine similarity over the time axis
    (reference: metrics.py:277-287): classes with no positive frames are
    masked out; the mask is normalized to unit sum per sample."""
    if isinstance(y_true, (tuple, list)):
        y_true = y_true[0]
    if isinstance(y_pred, (tuple, list)):
        y_pred = y_pred[0]
    mask = (jnp.sum(y_true, axis=-2) > 0.).astype(jnp.float32)   # [B, C]
    mask = safe_div(mask, jnp.sum(mask, axis=-1, keepdims=True))

    def l2n(x):
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(jnp.square(x), axis=-2, keepdims=True), 1e-12))
    cos = -jnp.sum(l2n(y_true) * l2n(y_pred), axis=-2)           # [B, C]
    return jnp.sum(cos * mask, axis=-1)


def f1_counts(y_true, y_pred, threshold: float = 0.5):
    """Micro-F1 sufficient statistics (tp, fp, fn) for one batch
    (reference: metrics.py:290-298 — tfa.metrics.F1Score(micro, 0.5) is
    stateful across an epoch; accumulate these counts and finish with
    :func:`f1_from_counts`)."""
    if isinstance(y_true, (tuple, list)):
        y_true = y_true[0]
    if isinstance(y_pred, (tuple, list)):
        y_pred = y_pred[0]
    pred = (y_pred > threshold).astype(jnp.float32)
    true = (y_true >= 0.5).astype(jnp.float32)
    tp = jnp.sum(pred * true)
    fp = jnp.sum(pred * (1 - true))
    fn = jnp.sum((1 - pred) * true)
    return jnp.stack([tp, fp, fn])


def f1_from_counts(counts):
    tp, fp, fn = counts
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-12)


def batch_metrics(config):
    """The per-batch metric dict matching the reference's compile(metrics=...)
    (reference: sj_train.py:454-457): cos_sim + F1 counts, plus er unless
    v == 5. The density trainer family (marked v == 0, the value
    cli/trainer.py sets) compiles cos_sim ONLY (reference:
    trainer.py:252-253) — er/f1 would threshold soft 30-dim count-density
    targets at 0.5, a meaningless (and per-step costly) statistic."""
    fns = {'cos_sim': lambda y, p: jnp.mean(cos_sim(y, p))}
    if config.v == 0:
        return fns
    fns['f1_counts'] = f1_counts
    if config.v != 5:
        er = er_score(smoothing=False)
        fns['er'] = lambda y, p: jnp.mean(er(
            y[0] if isinstance(y, (tuple, list)) else y,
            p[0] if isinstance(p, (tuple, list)) else p))
    return fns
