"""Fused W8A8 quantized matmul Pallas kernel.

Why: plain ``dot_general(int8, int8)`` through XLA gave NO speedup over
bf16 on v5e (BENCH_NOTES.md) — the dynamic activation-quantization ops
(absmax/round/clip) run as separate HBM-bound VPU passes. This kernel fuses
the whole W8A8 pipeline in VMEM per tile:

    x (BM, K) bf16  ──absmax──► x_scale (BM, 1)
                    ──round───► x_q int8 ─┐
    w_q (K, BN) int8 ─────────────────────┴─► int32 MXU dot
    epilogue: acc · x_scale · w_scale + bias → bf16 out

so activations are read once and the MXU runs in its 2× int8 mode
(v5e: 394 TOPS vs 197 TFLOP/s bf16).

STATUS: hardware-verified correct on v5e (0.86% rel err), but measured at
parity with bf16 (48 vs 47 TFLOP/s, in-jit chained loops) — the current
Mosaic toolchain does NOT emit the 2× int8 MXU mode for
``dot_general(int8, int8 → int32)``. Kept for when the toolchain does, and
as the fused-quantization reference; the bf16 path remains the default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: BM rows of activations × BN output channels, full-K tiles
# (encoder K ≤ 3072 ⇒ x tile ≤ 256·3072 int8 = 768 KB, fits VMEM)
BM = 256
BN = 512


def _w8a8_kernel(x_ref, wq_ref, ws_ref, bias_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)  # (BM, K)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_scale = jnp.maximum(absmax / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (BM, BN) on the int8 MXU
    y = acc.astype(jnp.float32) * x_scale * ws_ref[0][None, :]
    y = y + bias_ref[0][None, :]
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                bias: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """x (M, K) float → (M, N). w_q (K, N) int8, w_scale (N,) f32,
    bias (N,) f32. M must be a multiple of BM and N of BN (callers pad —
    encoder shapes already are)."""
    M, K = x.shape
    N = w_q.shape[1]
    grid = (M // BM, N // BN)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, N), bias.reshape(1, N))
