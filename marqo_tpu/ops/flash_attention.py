"""Pallas fused attention kernels for encoder stacks.

Replaces the XLA einsum-attention path for the hot encode loop: scores,
masking, softmax and the value matmul run in one VMEM-resident kernel, so
the (S, S) score matrix and the (B, S, S) mask never touch HBM. Masking is
computed in-kernel from compact inputs:

  - padding mask (B, S): standard ragged batches
  - segment ids (B, S): packed batches (ops/packing.py) — block-diagonal
    attention from segment equality

Encoder sequences here are short (≤ 512), so one program handles a full
(S, D_head) tile per (batch, head) — no online-softmax tiling needed; the
grid supplies the parallelism (B × N programs). Long-context models would
tile over S with the standard flash pattern.

Numerics: scores accumulate in fp32 on the MXU (preferred_element_type),
softmax in fp32, output cast back to the input dtype — bit-compatible with
the XLA path within bf16 rounding.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # finite: padded rows softmax to uniform, never NaN

# one-program-per-(batch, head) is efficient up to this sequence length;
# beyond it the score matrix stops fitting comfortably in VMEM
MAX_SINGLE_BLOCK_SEQ = 512


def _attention_kernel(seg_ref, q_ref, k_ref, v_ref, out_ref, *, mode: str,
                      heads_per_program: int):
    """One (batch, head-group): q,k,v (G, S, D) tiles; seg (1, S) int32.

    The mask is computed once per program and reused across the G heads in
    the group (statically unrolled 2D dots keep Mosaic's lowering simple)."""
    seg = seg_ref[0, 0]
    if mode == "segment":
        # block-diagonal: same nonzero segment id attends
        allowed = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
    else:
        # padding: key must be a real token
        allowed = jnp.broadcast_to(seg[None, :] > 0,
                                   (seg.shape[0], seg.shape[0]))
    depth = q_ref.shape[-1]
    scale = (1.0 / (depth ** 0.5))
    for g in range(heads_per_program):
        q = q_ref[0, g]
        k = k_ref[0, g]
        v = v_ref[0, g]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(allowed, scores, _NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out_ref[0, g] = jax.lax.dot_general(
            probs.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def _fused_attention(q, k, v, mask_input, mode: str):
    B, N, S, D = q.shape
    # one head per program: head-grouped variants compile poorly on the
    # current Mosaic toolchain (hangs observed at G>1 on v5e)
    G = 1
    grid = (B, N // G)
    kernel = functools.partial(_attention_kernel, mode=mode,
                               heads_per_program=G)
    interpret = jax.default_backend() == "cpu"
    # (B, 1, S) so the block's trailing dims satisfy TPU tiling rules
    mask_input = mask_input.reshape(B, 1, S)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, S, D), q.dtype),
        interpret=interpret,
    )(mask_input, q, k, v)


def attention_padding(q, k, v, pad_mask):
    """q,k,v: (B, N, S, D); pad_mask: (B, S) 1 = real token."""
    return _fused_attention(q, k, v, pad_mask.astype(jnp.int32),
                            mode="padding")


def attention_segment(q, k, v, segment_ids):
    """q,k,v: (B, N, S, D); segment_ids: (B, S), 0 = padding."""
    return _fused_attention(q, k, v, segment_ids.astype(jnp.int32),
                            mode="segment")


def supports_shape(seq_len: int) -> bool:
    return seq_len <= MAX_SINGLE_BLOCK_SEQ
