"""int8 quantized matmuls (W8A8) for encoder linear layers.

v5e's MXU runs int8 at 2× the bf16 rate (394 TOPS vs 197 TFLOP/s), and
embedding workloads are matmul-bound — so W8A8 on the six linear layers
per block is the lever past the bf16 speed-of-light (CLAUDE.md perf
notes). Scheme: per-output-channel symmetric weight scales (static, at
load) × per-token dynamic activation scales (absmax). Accumulation int32
on the MXU, dequantized fp32 epilogue. Opt-in via model properties /
MARQO_TPU_QUANTIZE=int8 — quantization trades ~1e-3..1e-2 cosine drift for
~1.5-2× throughput, so the default path stays bf16.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(in, out) weights → int8 values + per-out-channel fp32 scales."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)  # (1, out)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_stacked_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(L, in, out) stacked layer weights → (L, in, out) int8 +
    (L, 1, out) scales."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=1, keepdims=True)  # (L, 1, out)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., in) activations → int8 + per-token scales (..., 1)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                bias: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """x (B, S, in) @ w_q (in, out) with dequant epilogue → (B, S, out)."""
    x_q, x_scale = _quantize_activations(x)
    acc = jax.lax.dot_general(
        x_q, w_q, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale[None]
    return (y + bias.astype(jnp.float32)).astype(out_dtype)
