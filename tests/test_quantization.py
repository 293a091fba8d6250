"""int8 W8A8 encoder quantization: numerics vs the fp path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from dataclasses import replace

from marqo_tpu.models.bert import (TextEncoderConfig, encode_tokens,
                                   init_params, quantize_encoder_params)
from marqo_tpu.ops.quant import quantize_weight


class TestQuantOps:
    def test_weight_roundtrip_error(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        q, scale = quantize_weight(w)
        deq = q.astype(jnp.float32) * scale
        rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
        assert rel < 1.0 / 127 + 1e-6

    def test_int8_linear_matches_fp(self):
        from marqo_tpu.ops.quant import int8_linear
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        b = jnp.zeros((32,), jnp.float32)
        ref = np.asarray(x @ w)
        q, scale = quantize_weight(w)
        out = np.asarray(int8_linear(x, q, scale[0], b,
                                     out_dtype=jnp.float32))
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 0.03, rel


class TestQuantizedEncoder:
    def test_cosine_vs_fp32(self):
        config = TextEncoderConfig(vocab_size=500, hidden_size=64,
                                   num_layers=4, num_heads=4,
                                   intermediate_size=128,
                                   max_position_embeddings=64)
        params = init_params(config, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, 500, (4, 32)).astype(np.int32))
        mask = jnp.asarray(np.ones((4, 32), dtype=np.int32))
        ref = np.asarray(encode_tokens(params, ids, mask, config,
                                       compute_dtype=jnp.float32))
        q_params = quantize_encoder_params(params)
        q_config = replace(config, quantize=True)
        out = np.asarray(encode_tokens(q_params, ids, mask, q_config,
                                       compute_dtype=jnp.float32))
        cos = (ref * out).sum(-1)  # both L2-normalized
        assert np.all(cos > 0.99), cos

    def test_packed_quantized(self):
        from marqo_tpu.models.bert import encode_tokens_packed
        from marqo_tpu.ops.packing import pack_sequences
        config = TextEncoderConfig(vocab_size=200, hidden_size=32,
                                   num_layers=2, num_heads=2,
                                   intermediate_size=64,
                                   max_position_embeddings=64,
                                   quantize=True)
        params = quantize_encoder_params(
            init_params(replace(config, quantize=False), jax.random.PRNGKey(0)))
        rng = np.random.default_rng(2)
        seqs = [rng.integers(1, 200, size=rng.integers(4, 16)).tolist()
                for _ in range(6)]
        batch = pack_sequences(seqs, seq_len=24)
        out = np.asarray(encode_tokens_packed(
            params, jnp.asarray(batch.input_ids),
            jnp.asarray(batch.segment_ids), jnp.asarray(batch.positions),
            jnp.asarray(batch.seq_index), batch.n_sequences, config,
            compute_dtype=jnp.float32))
        assert out.shape == (6, 32)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-4)


class TestFusedW8A8Kernel:
    """Pallas fused quantized matmul (interpret mode on CPU; hardware
    verification deferred to round 2 per CLAUDE.md)."""

    def test_matches_reference_int8_linear(self):
        from marqo_tpu.ops.quant import int8_linear, quantize_weight
        from marqo_tpu.ops import quant_matmul as qm
        rng = np.random.default_rng(0)
        M, K, N = qm.BM, 128, qm.BN
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        w_q, w_scale = quantize_weight(w)
        ref = np.asarray(int8_linear(x[None], w_q, w_scale[0], bias,
                                     out_dtype=jnp.float32))[0]
        out = np.asarray(qm.w8a8_matmul(x, w_q, w_scale[0], bias,
                                        out_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)

    def test_multi_tile_grid(self):
        from marqo_tpu.ops.quant import quantize_weight
        from marqo_tpu.ops import quant_matmul as qm
        rng = np.random.default_rng(1)
        M, K, N = qm.BM * 2, 64, qm.BN * 2
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
        w_q, w_scale = quantize_weight(w)
        out = np.asarray(qm.w8a8_matmul(x, w_q, w_scale[0],
                                        jnp.zeros(N), out_dtype=jnp.float32))
        ref = np.asarray(x @ w)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 0.03, rel

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
