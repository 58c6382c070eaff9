"""Reference-API shim: ``utils`` (reference: utils.py).

Re-exports the challenge_tpu equivalents under the reference names so the
reference's utils_test.py runs unmodified. The Keras-facing pieces
(``AdaBelief`` optimizer, ``apply_kernel_regularizer``) live in
:mod:`challenge_tpu.interop.keras_compat`; the framework's own training path
uses the optax/flax versions in :mod:`challenge_tpu.train`.
"""

from challenge_tpu.ops.norms import EPSILON, LOG_EPSILON  # noqa: F401
from challenge_tpu.train.losses import sigmoid_focal_crossentropy  # noqa: F401
from challenge_tpu.train.optim import unitwise_norm  # noqa: F401
from challenge_tpu.utils.io import list_to_generator, load_data  # noqa: F401
from challenge_tpu.utils.predict import predict  # noqa: F401
from challenge_tpu.utils.windows import (  # noqa: F401
    seq_to_windows, windows_to_seq)

# reference: utils.py:7
label_downsample_model = (3, 6, 7, 8, 9)

# explicit __all__ so ``from utils import *`` (reference tests) resolves the
# lazily-built AdaBelief through module __getattr__. 'tf' is included
# because the reference module's star-import leaks its ``import tensorflow
# as tf`` and utils_test.py uses it.
__all__ = [
    'EPSILON', 'LOG_EPSILON', 'label_downsample_model', 'AdaBelief',
    'apply_kernel_regularizer', 'compute_norm', 'list_to_generator',
    'load_data', 'predict', 'safe_div', 'seq_to_windows',
    'sigmoid_focal_crossentropy', 'tf', 'unitwise_norm', 'windows_to_seq',
]


def safe_div(x, y, eps=EPSILON):
    """x / max(y, eps) (reference: utils.py:114-116)."""
    from challenge_tpu.ops.norms import safe_div as _safe_div
    return _safe_div(x, y, eps)


def compute_norm(x, axis, keepdims):
    """reference: utils.py:350-356."""
    import jax.numpy as jnp
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims))


def apply_kernel_regularizer(model, kernel_regularizer):
    from challenge_tpu.interop.keras_compat import (
        apply_kernel_regularizer as _impl)
    return _impl(model, kernel_regularizer)


def __getattr__(name):
    if name == 'AdaBelief':
        from challenge_tpu.interop.keras_compat import make_adabelief_class
        cls = make_adabelief_class()
        globals()['AdaBelief'] = cls
        return cls
    if name == 'tf':
        import tensorflow
        globals()['tf'] = tensorflow
        return tensorflow
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
