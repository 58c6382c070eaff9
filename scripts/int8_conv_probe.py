"""Verdict-#9 gating probe: can int8-quantized convs beat the vad train
step's bf16 conv wall on the v5e?

The fused vad-v8 train step plateaus at ~50% of bf16 peak (66 ms at B=128;
NOTES.md roofline: block-0/1 convs run 48-96 channels under the 128-lane
tile, bwd dW is HBM-bound). The v5e's int8 MXU peak is ~394 TOPS — 2x the
197 TF/s bf16 peak — so IF XLA's conv emitter reaches the int8 MXU path at
these shapes, quantized convs could shift the wall. This probe measures the
cheapest honest signal first: fwd conv chains per block shape, bf16 vs int8
(int8 operands, int32 accumulation, requantize-by-shift between layers —
the VPU cost a real quantized net pays), scan-of-N in one program with the
checksum FETCHED inside the timing window (NOTES.md round-5 pitfall).

Decision rule (pre-registered): int8 must win >20% on the block shapes that
carry the step's FLOPs to justify wiring a fake-quant train step + the
trained-ER no-regression check; a loss or sub-20% win closes the item
(the bwd pass — 2/3 of the step — would still be bf16, diluting any fwd
win by ~3x, and STE fake-quant ADDS quantize ops to the fwd).

MEASURED (v5e, round 5) — the item is CLOSED, int8 convs rejected:

  phase 1 (fwd-only conv chains, int8 + requant-shift vs bf16):
    block0 [128,80,512,48]:  bf16 4.844 ms (44.9 TF/s) | int8 3.397 x1.43
    block1 [128,40,256,96]:  bf16 3.350 ms (64.9 TF/s) | int8 2.426 x1.38
    block2 [128,20,128,192]: bf16 2.854 ms (76.2 TF/s) | int8 2.100 x1.36
    block3 [128,10,64,384]:  bf16 2.505 ms (86.8 TF/s) | int8 1.845 x1.36
    block4 [128,5,32,768]:   bf16 2.376 ms (91.5 TF/s) | int8 1.736 x1.37
  phase 2 (fwd+bwd 2-conv block, the number a fake-quant STEP would see):
    block0: bf16 14.94 ms | STE-int8 static x0.96 | dynamic x0.87  (LOSS)
    block3: bf16  8.15 ms | STE-int8 static x1.16 | dynamic x1.15

  The fwd-only MXU win is real (~1.4x uniformly) but a fake-quant train
  step cannot keep it: at the wall shapes (block 0/1 — the majority of
  the step's conv time, where the verdict item aimed) the quantize/
  round/clip passes over the huge activations are extra HBM-bound
  elementwise work at exactly the place the step is bandwidth-limited,
  and the bwd convs (2/3 of conv FLOPs) stay bf16 — net x0.87-0.96,
  i.e. SLOWER. Deep blocks gain ~15% but hold a minority of the FLOPs
  (NOTES roofline), bounding the best-case composite well under the
  pre-registered 20% bar before any accuracy risk is even considered.
  Conclusion: the ~50%-of-bf16-peak plateau stands; int8 on this step
  is a capacity story (banks), not a compute story (convs).

Run:  python scripts/int8_conv_probe.py
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

import challenge_tpu  # noqa: F401  (enables the persistent compile cache)

# vad v8 at B=128: NHWC activation shapes per ConvMPBlock (each block runs
# 2-3 SAME 3x3 convs at constant width, then pools /2); bwd excluded here
SHAPES = [
    ('block0', (128, 80, 512, 48)),
    ('block1', (128, 40, 256, 96)),
    ('block2', (128, 20, 128, 192)),
    ('block3', (128, 10, 64, 384)),
    ('block4', (128, 5, 32, 768)),
]
ITERS = 20
REPEATS = 3


def conv(x, w, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=out_dtype)


def time_program(program, *args):
    out = program(*args)
    assert np.isfinite(float(jnp.sum(out).astype(jnp.float32)))  # compile
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        # fetch, don't just block: the only sync the tunnel cannot fake
        s = float(jnp.sum(program(*args)).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(s)
    return min(times) / ITERS


def main():
    rng = np.random.default_rng(0)
    for name, shape in SHAPES:
        b, h, w_, c = shape
        x32 = rng.standard_normal(shape).astype(np.float32)
        k32 = (rng.standard_normal((3, 3, c, c)) / np.sqrt(9 * c)).astype(
            np.float32)
        flops = 2 * b * h * w_ * c * c * 9 * ITERS

        xb = jnp.asarray(x32, jnp.bfloat16)
        kb = jnp.asarray(k32, jnp.bfloat16)

        @jax.jit
        def prog_bf16(x, k):
            def body(acc, _):
                return conv(acc, k), None
            y, _ = jax.lax.scan(body, x, None, length=ITERS)
            return y

        t_bf16 = time_program(prog_bf16, xb, kb)
        print(f'{name} {shape}: bf16 {t_bf16 * 1e3:7.3f} ms/conv '
              f'({flops / ITERS / t_bf16 / 1e12:6.1f} TF/s)', flush=True)

        # int8: symmetric per-tensor quantization, int32 accumulation,
        # requantize between layers by a static right-shift (the cheapest
        # possible requant — real nets need at least this)
        xi = jnp.asarray(
            np.clip(np.round(x32 * 16), -127, 127), jnp.int8)
        ki = jnp.asarray(
            np.clip(np.round(k32 * 127 / np.abs(k32).max()), -127, 127),
            jnp.int8)

        @jax.jit
        def prog_int8(x, k):
            def body(acc, _):
                y = conv(acc, k, out_dtype=jnp.int32)
                # shift back toward int8 range; clip like a requant stage
                y = jnp.clip(y >> 7, -127, 127)
                return y.astype(jnp.int8), None
            y, _ = jax.lax.scan(body, x, None, length=ITERS)
            return y

        try:
            t_int8 = time_program(prog_int8, xi, ki)
            msg = (f'int8 {t_int8 * 1e3:7.3f} ms/conv '
                   f'({flops / ITERS / t_int8 / 1e12:6.1f} TOP/s) '
                   f'speedup x{t_bf16 / t_int8:4.2f}')
        except Exception as e:  # compile rejection is itself the answer
            msg = f'int8 FAILED: {type(e).__name__}: {str(e)[:120]}'
        print(f'{name} {shape}: {msg}', flush=True)


def _ste_conv(static_scale):
    """Fake-quant conv with a straight-through estimator: fwd runs the int8
    MXU path (int8 operands, int32 accumulation, dequant by the product of
    the two scales); bwd is the EXACT bf16 conv gradient at the unquantized
    operands (what a fake-quant train step would do — the bwd convs stay
    bf16 because int8 needs BOTH operands quantized and gradients don't
    survive 8-bit). static_scale=True uses fixed power-of-2 scales;
    False recomputes per-tensor max-abs each call (an extra full read of
    the activation volume — the accuracy-safe variant)."""

    def quant(v, scale):
        return jnp.clip(jnp.round(v.astype(jnp.float32) / scale),
                        -127, 127).astype(jnp.int8), scale

    @jax.custom_vjp
    def qconv(x, w):
        if static_scale:
            sx = jnp.float32(1 / 16.)
            sw = jnp.float32(1 / 512.)
        else:
            sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.
            sw = jnp.max(jnp.abs(w)).astype(jnp.float32) / 127.
        xi, sx = quant(x, sx)
        wi, sw = quant(w, sw)
        y = conv(xi, wi, out_dtype=jnp.int32)
        return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)

    def fwd(x, w):
        return qconv(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        _, vjp = jax.vjp(lambda a, b: conv(a, b), x, w)
        return vjp(dy)

    qconv.defvjp(fwd, bwd)
    return qconv


def step_level_ab():
    """Phase 2: what a fake-quant FUSED STEP would see — fwd+bwd through a
    2-conv block (the ConvMPBlock shape), bf16 vs STE-int8. The bwd convs
    (2/3 of conv FLOPs) stay bf16 either way, so this measures the realistic
    dilution of phase 1's fwd-only speedup, plus the quantize overhead
    (round/clip elementwise; the dynamic variant adds a max-|x| reduction —
    a full extra read of the activation volume)."""
    rng = np.random.default_rng(1)
    for name, shape in (('block0', (128, 80, 512, 48)),
                        ('block3', (128, 10, 64, 384))):
        b, h, w_, c = shape
        x0 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) / np.sqrt(9 * c),
                         jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) / np.sqrt(9 * c),
                         jnp.bfloat16)
        # 2 convs fwd + 3-4 grad convs bwd ~ a ConvMPBlock's share
        results = {}
        for mode in ('bf16', 'int8_static', 'int8_dynamic'):
            cv = (conv if mode == 'bf16'
                  else _ste_conv(static_scale=(mode == 'int8_static')))

            def loss(x, a, bw):
                y = jax.nn.relu(cv(x, a))
                y = jax.nn.relu(cv(y, bw))
                return jnp.sum(y.astype(jnp.float32))

            gfn = jax.grad(loss, argnums=(0, 1, 2))

            @jax.jit
            def prog(x, a, bw):
                def body(acc, _):
                    gx, ga, gb = gfn(x + acc.astype(x.dtype) * 1e-6, a, bw)
                    s = (jnp.sum(gx).astype(jnp.float32)
                         + jnp.sum(ga).astype(jnp.float32)
                         + jnp.sum(gb).astype(jnp.float32))
                    return s * 1e-9, None
                out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                      None, length=ITERS)
                return out

            out = prog(x0, w1, w2)
            assert np.isfinite(float(out))
            times = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                s = float(prog(x0, w1, w2))
                times.append(time.perf_counter() - t0)
            assert np.isfinite(s)
            results[mode] = min(times) / ITERS
            print(f'{name} fwd+bwd 2-conv block [{mode}]: '
                  f'{results[mode] * 1e3:7.3f} ms/iter', flush=True)
        base = results['bf16']
        print(f'{name} step-level speedup: static x{base / results["int8_static"]:4.2f}, '
              f'dynamic x{base / results["int8_dynamic"]:4.2f}', flush=True)


if __name__ == '__main__':
    main()
    step_level_ab()

