"""Multi-head attention for encoder stacks.

Two implementations behind one call:
  - "xla": einsum attention; XLA fuses softmax+masking into the matmuls. For
    encoder shapes (S ≤ 512) this keeps the MXU busy and is the default.
  - "pallas": fused flash-style kernel (ops/flash_attention.py) for long
    sequences where the S×S score matrix would spill out of VMEM.

Encoder attention is bidirectional; ``mask`` is (B, S) with 1 = real token.
"""

from functools import partial

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # large finite value: safe in bf16 softmax, avoids NaN rows


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """q,k,v: (B, N, S, D); mask: (B, S). Returns (B, N, S, D)."""
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(depth).astype(q.dtype)
    scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, _NEG_INF)
    scores = scores.astype(jnp.float32) + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,bntd->bnsd", probs, v)


@partial(jax.jit, static_argnames=("impl",))
def multi_head_attention(q, k, v, mask, impl: str = "xla"):
    if impl == "pallas":
        from marqo_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, mask)
    return xla_attention(q, k, v, mask)
