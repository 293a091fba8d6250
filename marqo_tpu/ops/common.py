"""Shared elementwise / normalization ops for encoders.

TPU notes: LayerNorm statistics accumulate in fp32 regardless of the compute
dtype (bf16 on the MXU); XLA fuses these into neighbouring matmuls, so the
plain-jnp forms here compile to fused HBM-friendly kernels.
"""

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-12) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches HF BERT's default ``gelu`` activation."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu": gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "tanh": jnp.tanh,
}


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize in fp32 (embedding outputs must be stable across dtypes)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x32, axis=axis, keepdims=True)
    return x32 / jnp.maximum(norm, eps)


def masked_mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean-pool token states with an attention mask.

    Parity: reference HuggingFaceModel mean pooling
    (core/inference/embedding_models/hugging_face_model.py:163-210).

    hidden: (B, S, H); mask: (B, S) with 1 for real tokens.
    """
    m = mask.astype(jnp.float32)[..., None]
    h32 = hidden.astype(jnp.float32)
    summed = jnp.sum(h32 * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return summed / counts


def cls_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """CLS pooling (first token)."""
    del mask
    return hidden[:, 0, :].astype(jnp.float32)
