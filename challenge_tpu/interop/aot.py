"""AOT serving export: compile-free inference artifacts via jax.export.

The reference ships model weights (.h5) but always needs its Python model
code to serve — eval.py:63-65 rebuilds the architecture with get_model
before load_weights. The TPU-idiomatic serving artifact is the lowered
program itself: ``jax.export`` serializes the inference-mode forward —
architecture AND weights — as versioned StableHLO that a later process
(or a non-Python PjRt host) can execute without challenge_tpu, flax, or
the original checkpoint. The batch dimension is exported symbolically, so
one artifact serves any batch size.

Scope: the per-window model forward (the unit the serving loop batches
over — reference metrics.py:62 ``model.predict`` on framed windows).
The symbolic batch holds for the recurrent heads too (the RNN scan runs
over time; batch only rides the carried state); ``batch_size`` can still
pin a static batch when a serving runtime wants one fixed program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_infer(bundle, variables, path: Optional[str] = None,
                 batch_size: Optional[int] = None,
                 platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``bundle``'s inference forward with ``variables`` baked in.

    batch_size None exports a symbolic batch dimension (any batch size at
    call time — the RNN-headed versions included); an int pins one static
    batch. platforms defaults to the current JAX backend; pass e.g.
    ``('tpu', 'cpu')`` for a multi-platform artifact. Returns the
    serialized bytes, also written to ``path`` when given.
    """
    def infer(x):
        return bundle.apply(variables, x, training=False)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape('b')
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b,) + tuple(bundle.input_shape),
                                jnp.float32)
    exported = jax_export.export(
        jax.jit(infer),
        platforms=None if platforms is None else list(platforms))(spec)
    data = exported.serialize()
    if path is not None:
        with open(path, 'wb') as f:
            f.write(bytes(data))
    return bytes(data)


def load_infer(artifact: Union[str, bytes]):
    """Deserialize an :func:`export_infer` artifact into a callable.

    ``artifact`` is the path or the raw bytes. The returned function maps
    ``[B, *input_shape] float32 -> model outputs`` and jit-compiles for
    the local backend on first call; no model code or weights needed.
    """
    if isinstance(artifact, str):
        with open(artifact, 'rb') as f:
            artifact = f.read()
    exported = jax_export.deserialize(bytearray(artifact))
    return jax.jit(exported.call)
