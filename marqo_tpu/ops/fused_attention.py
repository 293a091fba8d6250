"""Fused multi-head attention on the maintained JAX TPU flash kernel.

Round-1/2 history (BENCH_NOTES): the XLA einsum attention path is
HBM-bound on the (B, N, S, S) score tensors (~200 µs/layer on ViT-L/14
where the matmul FLOPs cost ~17 µs), and the hand-rolled one-program-per-
(batch, head) Pallas kernel (ops/flash_attention.py) was program-overhead-
bound (256 programs × <1 µs compute each), with the head-grouped variant
hanging Mosaic. This module instead wraps
``jax.experimental.pallas.ops.tpu.flash_attention`` — the pipelined,
production Mosaic kernel — whose ``block_b`` batches several batch
elements per program, precisely the "more work per program" fix the
round-1 failure mode needs (VERDICT r3 items 1 and 5).

Scope rules (from the kernel's own constraints):
  - no-mask mode (ViT image towers): any seq length (lane padding is
    internal to Mosaic);
  - segment/padding mode: kv sequence must be a multiple of 128 — true
    for the 128/256/512 text encode buckets, not the tiny query buckets
    (those fall back to XLA einsum, where batch-1 attention is cheap).

On CPU backends the kernel runs in interpret mode (slow, exact) so the
same code path is testable without hardware; production CPU fallback is
the models' XLA einsum path, selected by ``supports(...)`` returning
False off-TPU unless interpret is explicitly requested.

Parity citation: replaces the score/softmax/context einsums of
reference CLIP/HF attention (torch SDPA in clip_utils.py / BERT
self-attention) with identical masked-softmax semantics.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.flash_attention import (  # noqa: E501
    BlockSizes, SegmentIds, flash_attention)

# With block_b batching, program count = B/block_b × N × (S/block_q)²-ish;
# these defaults keep programs ≥ ~100 µs of MXU work on encoder shapes.
_MAX_BLOCK = 512


def _block_sizes(batch: int, q_len: int, kv_len: int) -> BlockSizes:
    bq = min(_MAX_BLOCK, q_len)
    bk = min(_MAX_BLOCK, kv_len)
    return BlockSizes(block_q=bq, block_k_major=bk, block_k=bk,
                      block_b=min(batch, 8))


def flash_enabled() -> bool:
    """Env gate, read at trace time. Default OFF: round-3 measurements
    (BENCH_NOTES round-3 section) show the flash kernel is perf-NEUTRAL
    on ViT-L/14 e2e (~705 vs ~702 imgs/s across 8 alternating runs, block
    sweep bb∈{4,8,16} never beating einsum) and 20% SLOWER on the packed
    BERT headline (68.7 vs 57.1 ms/batch) — XLA's fused einsum attention
    is already at the same VPU-softmax floor. Set
    MARQO_TPU_FUSED_ATTENTION=TRUE to opt in (e.g. for long-seq models
    where one (S, S) score tile stops fitting VMEM)."""
    from marqo_tpu.api import configs
    v = configs.read_env_vars_and_defaults("MARQO_TPU_FUSED_ATTENTION")
    return v is not None and str(v).upper() == "TRUE"


def supports(seq_len: int, masked: bool) -> bool:
    """Whether the fused kernel applies to this shape on this backend."""
    if jax.default_backend() != "tpu":
        return False
    if masked and seq_len % 128 != 0:
        return False  # kernel: kv block must be a multiple of 128
    return True


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_nomask(q, k, v, interpret: bool = False):
    B, N, S, D = q.shape
    sm_scale = float(1.0 / (D ** 0.5))
    blocks = _block_sizes(B, S, S)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, sm_scale=sm_scale,
                                   block_sizes=blocks)
    return flash_attention(q, k, v, sm_scale=sm_scale, block_sizes=blocks)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_segments(q, k, v, segment_ids, interpret: bool = False):
    B, N, S, D = q.shape
    sm_scale = float(1.0 / (D ** 0.5))
    blocks = _block_sizes(B, S, S)
    sids = SegmentIds(q=segment_ids, kv=segment_ids)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, segment_ids=sids,
                                   sm_scale=sm_scale, block_sizes=blocks)
    return flash_attention(q, k, v, segment_ids=sids, sm_scale=sm_scale,
                           block_sizes=blocks)


def fused_attention(q, k, v, pad_mask: Optional[jax.Array] = None,
                    segment_ids: Optional[jax.Array] = None,
                    interpret: bool = False) -> jax.Array:
    """q, k, v: (B, N, S, D). Exactly one of the masks, or neither.

    pad_mask (B, S) 0/1: real-token mask → tokens attend to real tokens
    (pad rows attend each other; their outputs are discarded upstream).
    segment_ids (B, S) int: packed block-diagonal attention; 0 = padding.
    The kernel applies 1/sqrt(D) scaling internally — callers must pass
    UNscaled q.
    """
    if segment_ids is not None:
        return _mha_segments(q, k, v, segment_ids.astype(jnp.int32),
                             interpret=interpret)
    if pad_mask is not None:
        # padding is segment masking with ids {0, 1}
        return _mha_segments(q, k, v,
                             (pad_mask > 0).astype(jnp.int32),
                             interpret=interpret)
    return _mha_nomask(q, k, v, interpret=interpret)
