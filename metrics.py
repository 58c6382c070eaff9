"""Reference-API shim: ``metrics`` (reference: metrics.py).

Re-exports the challenge_tpu metric/eval implementations under the
reference names so the reference's metrics_test.py runs unmodified.
``evaluate`` here is the framework's TPU eval loop (signature:
``evaluate(config, bundle, variables, ...)`` — the reference's Keras-model
variant is reachable by loading an .h5 through
:mod:`challenge_tpu.interop.keras_h5` and passing the imported variables).
"""

from challenge_tpu.evaluate.events import (  # noqa: F401
    Challenge_Metric, ChallengeMetric, extract_middle, get_er,
    get_second_answer, get_start_end_frame, get_start_end_time,
    output_to_metric, second2frame)
from challenge_tpu.evaluate.infer import evaluate  # noqa: F401
from challenge_tpu.train.callbacks import EvalCallback as eval_callback  # noqa: F401
from challenge_tpu.train.metrics import cos_sim  # noqa: F401
from challenge_tpu.train.metrics import er_score as _er_score
from challenge_tpu.train.metrics import f1_counts, f1_from_counts  # noqa: F401


def er_score(threshold=0.5, smoothing=True):
    """Batched challenge ER (reference: metrics.py:217-274), numpy in/out."""
    import numpy as np
    import jax.numpy as jnp
    fn = _er_score(threshold=threshold, smoothing=smoothing)

    def er(y_true, y_pred):
        return np.asarray(fn(jnp.asarray(np.asarray(y_true), jnp.float32),
                             jnp.asarray(np.asarray(y_pred), jnp.float32)))
    return er


def f1_score(y_true, y_pred):
    """Micro-F1 at threshold 0.5 (reference: metrics.py:290-298) as a plain
    batch function."""
    import numpy as np
    import jax.numpy as jnp
    counts = f1_counts(jnp.asarray(np.asarray(y_true), jnp.float32),
                       jnp.asarray(np.asarray(y_pred), jnp.float32))
    return np.asarray(f1_from_counts(counts))
