"""Pallas fused-attention parity vs. the XLA einsum path (interpret mode on
CPU; compiled Mosaic on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from marqo_tpu.ops.flash_attention import attention_padding, attention_segment


def _qkv(B=2, N=2, S=16, D=8, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.standard_normal((B, N, S, D)).astype(np.float32))
            for _ in range(3)]


def _xla_reference(q, k, v, allowed):
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
    scores = jnp.where(allowed[:, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnst,bntd->bnsd", probs, v)


class TestPaddingAttention:
    def test_matches_xla(self):
        q, k, v = _qkv()
        mask = np.ones((2, 16), dtype=np.int32)
        mask[0, 10:] = 0
        mask = jnp.asarray(mask)
        allowed = (mask[:, None, :] > 0) & jnp.ones((2, 16, 1), bool)
        ref = _xla_reference(q, k, v, allowed.transpose(0, 2, 1) | allowed[:, :, :])
        # reference: key-padding only
        allowed_kp = jnp.broadcast_to((mask[:, None, :] > 0), (2, 16, 16))
        ref = _xla_reference(q, k, v, allowed_kp)
        out = attention_padding(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestSegmentAttention:
    def test_matches_xla_block_diagonal(self):
        q, k, v = _qkv(seed=1)
        segs = np.zeros((2, 16), dtype=np.int32)
        segs[0, :5] = 1
        segs[0, 5:12] = 2
        segs[1, :16] = 1
        segs = jnp.asarray(segs)
        allowed = (segs[:, None, :] == segs[:, :, None]) & (segs[:, None, :] > 0)
        ref = _xla_reference(q, k, v, allowed)
        out = attention_segment(q, k, v, segs)
        # compare only real-token rows (pad rows are don't-care)
        real = np.asarray(segs) > 0
        ref_np, out_np = np.asarray(ref), np.asarray(out)
        for b in range(2):
            np.testing.assert_allclose(out_np[b][:, real[b]],
                                       ref_np[b][:, real[b]],
                                       atol=1e-5, rtol=1e-5)

    def test_no_cross_segment_leakage(self):
        """Changing tokens in segment 2 must not affect segment 1 outputs."""
        q, k, v = _qkv(seed=2)
        segs = np.zeros((2, 16), dtype=np.int32)
        segs[:, :8] = 1
        segs[:, 8:] = 2
        segs = jnp.asarray(segs)
        out1 = np.asarray(attention_segment(q, k, v, segs))
        k2 = k.at[:, :, 8:, :].set(0.0)
        v2 = v.at[:, :, 8:, :].set(0.0)
        out2 = np.asarray(attention_segment(q, k2, v2, segs))
        np.testing.assert_allclose(out1[:, :, :8], out2[:, :, :8], atol=1e-6)


class TestEncoderWithPallasAttention:
    def test_bert_pallas_matches_xla(self):
        from dataclasses import replace
        from marqo_tpu.models.bert import (TextEncoderConfig, encode_tokens,
                                           init_params)
        config = TextEncoderConfig(vocab_size=100, hidden_size=32,
                                   num_layers=2, num_heads=2,
                                   intermediate_size=64,
                                   max_position_embeddings=32)
        params = init_params(config, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 100, (2, 16)).astype(np.int32))
        mask = np.ones((2, 16), dtype=np.int32)
        mask[1, 9:] = 0
        mask = jnp.asarray(mask)
        ref = np.asarray(encode_tokens(params, ids, mask, config,
                                       compute_dtype=jnp.float32))
        pallas_config = replace(config, attention_impl="pallas")
        out = np.asarray(encode_tokens(params, ids, mask, pallas_config,
                                       compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=1e-5)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
