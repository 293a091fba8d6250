"""ops/fused_attention.py parity vs the models' XLA einsum attention math,
run in Pallas interpret mode on CPU (the smoke-test protocol's first gate:
no kernel reaches the TPU without passing these)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from marqo_tpu.ops.fused_attention import fused_attention, supports


def _einsum_attention(q, k, v, pad_mask=None, segment_ids=None):
    """The models' reference math (models/bert.py transformer_block)."""
    D = q.shape[-1]
    scale = 1.0 / np.sqrt(D)
    scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
    scores = scores.astype(jnp.float32)
    if segment_ids is not None:
        allowed = (segment_ids[:, None, :] == segment_ids[:, :, None])
        scores = scores + jnp.where(allowed[:, None], 0.0, -1e9)
    elif pad_mask is not None:
        allowed = (pad_mask[:, None, :] > 0) == (pad_mask[:, :, None] > 0)
        scores = scores + jnp.where(allowed[:, None], 0.0, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,bntd->bnsd", probs, v)


def _qkv(B=2, N=4, S=128, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, S, D)) * 0.3, dtype)
    return mk(), mk(), mk()


class TestFusedAttentionInterpret:
    def test_nomask_matches_einsum(self):
        q, k, v = _qkv()
        out = fused_attention(q, k, v, interpret=True)
        ref = _einsum_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_nomask_odd_seq_vit_shape(self):
        # ViT-L/14: 257 tokens padded to 264 (not a lane multiple)
        q, k, v = _qkv(B=2, N=2, S=264 // 4, D=32)  # scaled-down odd seq
        out = fused_attention(q, k, v, interpret=True)
        ref = _einsum_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_padding_mask(self):
        q, k, v = _qkv()
        lengths = np.array([100, 77])
        pad = jnp.asarray(
            (np.arange(128)[None, :] < lengths[:, None]).astype(np.int32))
        out = fused_attention(q, k, v, pad_mask=pad, interpret=True)
        ref = _einsum_attention(q, k, v, pad_mask=pad)
        # compare real-token rows only (pad rows are discarded upstream)
        m = np.asarray(pad)[:, None, :, None]
        np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m,
                                   atol=2e-5)

    def test_packed_segments(self):
        q, k, v = _qkv(seed=3)
        rng = np.random.default_rng(4)
        # contiguous runs of segment ids like ops/packing.py produces
        seg = np.zeros((2, 128), np.int32)
        for b in range(2):
            pos, sid = 0, 1
            while pos < 128:
                L = int(rng.integers(8, 40))
                seg[b, pos:pos + L] = sid
                pos += L
                sid += 1
        seg = jnp.asarray(seg)
        out = fused_attention(q, k, v, segment_ids=seg, interpret=True)
        ref = _einsum_attention(q, k, v, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_bf16_inputs(self):
        q, k, v = _qkv(dtype=jnp.bfloat16)
        out = fused_attention(q, k, v, interpret=True)
        ref = _einsum_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2)

    def test_supports_gating(self):
        # off-TPU: never claims support (models fall back to einsum)
        assert supports(128, masked=True) is False
        assert supports(264, masked=False) is False
