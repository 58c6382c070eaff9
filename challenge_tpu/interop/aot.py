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


def export_eval(bundle, variables, s_max: int, wav_channels: int = 2,
                overlap_hop: int = 512, path: Optional[str] = None,
                n_clips: Optional[int] = None,
                platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the WHOLE challenge-eval program, weights baked in.

    The serving task is not just the model forward: the reference's eval
    chain (metrics.py:42-81) runs ingest -> features -> sliding windows ->
    batched forward -> overlap-add averaging -> 0.5 s/2 s smoothing ->
    thresholding around it. This exports that entire chain as ONE
    StableHLO artifact mapping raw PCM to thresholded frame grids:

        (pcm int16 [N, wav_channels, s_max], lens int32 [N])
            -> grids float32 [N, T_row, n_classes]

    where ``lens`` are the clips' true sample counts (rows zero-filled to
    the static ``s_max``) and each grid's first ``lens[i]//256 + 1`` rows
    are valid. Grids are bit-identical to the live ``evaluate`` batched
    path (same body — evaluate/infer.py:devset_infer_body); only the
    variable-length event extraction/ER matching stays host-side (plain
    numpy, reference metrics.py:109-214). N is symbolic by default (one
    artifact serves any corpus size); ``n_clips`` pins it. Models whose
    heads take a per-clip seed (n_chan > 3 channel mixes) export a third
    int32 [N] ``seeds`` argument.
    """
    from challenge_tpu.evaluate.infer import devset_infer_body
    body, takes_seed = devset_infer_body(bundle, bundle.config, overlap_hop)

    if takes_seed:
        def run(pcm, lens, seeds):
            return body(variables, pcm, lens, seeds)
    else:
        def run(pcm, lens):
            return body(variables, pcm, lens,
                        jnp.zeros(lens.shape, jnp.int32))

    if n_clips is None:
        (n,) = jax_export.symbolic_shape('n')
    else:
        n = int(n_clips)
    specs = [jax.ShapeDtypeStruct((n, wav_channels, int(s_max)), jnp.int16),
             jax.ShapeDtypeStruct((n,), jnp.int32)]
    if takes_seed:
        specs.append(jax.ShapeDtypeStruct((n,), jnp.int32))
    exported = jax_export.export(
        jax.jit(run),
        platforms=None if platforms is None else list(platforms))(*specs)
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
