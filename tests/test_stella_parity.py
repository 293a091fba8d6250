"""Stella (hf_stella / GTE-v1.5 "NewModel" arch) parity tests.

The checkpoint's remote code cannot be fetched offline, so — like the
other families — parity is architecture + conversion equivalence against a
random-init torch mirror implementing the same published architecture
(RoPE attention with packed qkv_proj, up/gate MLP, post-LN residuals,
mean pool + vector_linear head). Reference loader:
hugging_face_stella_model.py:9-23; registry model_registry.py:898-904."""

import math

import numpy as np
import pytest
import torch

from marqo_tpu.models.stella import (StellaConfig, encode_tokens,
                                     init_params,
                                     params_from_torch_state_dict,
                                     stella_400m_config)

torch.manual_seed(0)


class TorchStellaMirror(torch.nn.Module):
    """Minimal torch implementation of the GTE "new" block for conversion
    testing (same math as the remote-code NewModel)."""

    def __init__(self, cfg: StellaConfig):
        super().__init__()
        self.cfg = cfg
        H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
        self.word = torch.nn.Embedding(cfg.vocab_size, H)
        self.token_type = torch.nn.Embedding(cfg.type_vocab_size, H)
        self.emb_ln = torch.nn.LayerNorm(H, eps=cfg.layer_norm_eps)
        self.layers = torch.nn.ModuleList()
        for _ in range(L):
            layer = torch.nn.Module()
            layer.qkv = torch.nn.Linear(H, 3 * H)
            layer.o = torch.nn.Linear(H, H)
            layer.attn_ln = torch.nn.LayerNorm(H, eps=cfg.layer_norm_eps)
            layer.up_gate = torch.nn.Linear(H, 2 * I, bias=False)
            layer.down = torch.nn.Linear(I, H)
            layer.mlp_ln = torch.nn.LayerNorm(H, eps=cfg.layer_norm_eps)
            self.layers.append(layer)
        self.proj = torch.nn.Linear(H, cfg.projection_dim)

    def _rope(self, x):
        # x: (B, N, S, D), rotate-half pairs (x[..., :D/2], x[..., D/2:])
        B, N, S, D = x.shape
        pos = torch.arange(S, dtype=torch.float32)
        freqs = self.cfg.rope_theta ** (
            -torch.arange(0, D, 2, dtype=torch.float32) / D)
        ang = pos[:, None] * freqs[None, :]
        cos, sin = torch.cos(ang), torch.sin(ang)
        x1, x2 = x[..., :D // 2], x[..., D // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def forward(self, input_ids, attention_mask):
        cfg = self.cfg
        B, S = input_ids.shape
        N, D = cfg.num_heads, cfg.head_dim
        x = self.word(input_ids) + self.token_type(
            torch.zeros_like(input_ids))
        x = self.emb_ln(x)
        for layer in self.layers:
            qkv = layer.qkv(x)
            q, k, v = qkv.chunk(3, dim=-1)
            q = q.view(B, S, N, D).transpose(1, 2)
            k = k.view(B, S, N, D).transpose(1, 2)
            v = v.view(B, S, N, D).transpose(1, 2)
            q, k = self._rope(q), self._rope(k)
            scores = (q @ k.transpose(-1, -2)) / math.sqrt(D)
            scores = scores + torch.where(
                attention_mask[:, None, None, :] > 0,
                torch.zeros(()), torch.full((), -1e9))
            ctx = torch.softmax(scores, dim=-1) @ v
            ctx = ctx.transpose(1, 2).reshape(B, S, -1)
            x = layer.attn_ln(x + layer.o(ctx))
            up, gate = layer.up_gate(x).chunk(2, dim=-1)
            x = layer.mlp_ln(x + layer.down(
                torch.nn.functional.gelu(gate) * up))
        mask = attention_mask[:, :, None].float()
        pooled = (x * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        out = self.proj(pooled)
        return torch.nn.functional.normalize(out, dim=-1)

    def state_dict_newmodel(self):
        """State dict with the remote-code ("new.") naming our converter
        expects."""
        sd = {
            "new.embeddings.word_embeddings.weight": self.word.weight,
            "new.embeddings.token_type_embeddings.weight":
                self.token_type.weight,
            "new.embeddings.LayerNorm.weight": self.emb_ln.weight,
            "new.embeddings.LayerNorm.bias": self.emb_ln.bias,
        }
        for i, layer in enumerate(self.layers):
            p = f"new.encoder.layer.{i}."
            sd[p + "attention.qkv_proj.weight"] = layer.qkv.weight
            sd[p + "attention.qkv_proj.bias"] = layer.qkv.bias
            sd[p + "attention.o_proj.weight"] = layer.o.weight
            sd[p + "attention.o_proj.bias"] = layer.o.bias
            sd[p + "attn_ln.weight"] = layer.attn_ln.weight
            sd[p + "attn_ln.bias"] = layer.attn_ln.bias
            sd[p + "mlp.up_gate_proj.weight"] = layer.up_gate.weight
            sd[p + "mlp.down_proj.weight"] = layer.down.weight
            sd[p + "mlp.down_proj.bias"] = layer.down.bias
            sd[p + "mlp_ln.weight"] = layer.mlp_ln.weight
            sd[p + "mlp_ln.bias"] = layer.mlp_ln.bias
        return sd


TINY = StellaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                    num_heads=4, intermediate_size=64, type_vocab_size=1,
                    projection_dim=24, rope_theta=1000.0)


class TestStellaParity:
    def test_torch_conversion_fp32_parity(self):
        import jax.numpy as jnp
        mirror = TorchStellaMirror(TINY)
        params = params_from_torch_state_dict(
            mirror.state_dict_newmodel(), TINY, dtype=jnp.float32,
            vector_linear={"weight": mirror.proj.weight.detach().numpy(),
                           "bias": mirror.proj.bias.detach().numpy()})
        rng = np.random.default_rng(0)
        ids = rng.integers(0, TINY.vocab_size, (3, 10)).astype(np.int32)
        mask = np.ones((3, 10), np.int32)
        mask[1, 6:] = 0
        mask[2, 3:] = 0
        with torch.no_grad():
            expected = mirror(torch.from_numpy(ids).long(),
                              torch.from_numpy(mask).long()).numpy()
        got = np.asarray(encode_tokens(
            params, jnp.asarray(ids), jnp.asarray(mask), TINY,
            compute_dtype=jnp.float32))
        cos = np.sum(expected * got, axis=-1)
        np.testing.assert_allclose(got, expected, atol=2e-5)
        assert np.all(cos > 1 - 1e-6)

    def test_rope_changes_with_position(self):
        """Same token at different positions must embed differently (RoPE),
        while a no-RoPE model with absolute-position-free embeddings would
        be permutation invariant."""
        import jax
        import jax.numpy as jnp
        params = init_params(TINY, jax.random.PRNGKey(0))
        ids_a = jnp.asarray([[5, 7, 9, 11]], dtype=jnp.int32)
        ids_b = jnp.asarray([[9, 7, 5, 11]], dtype=jnp.int32)
        mask = jnp.ones((1, 4), dtype=jnp.int32)
        out_a = encode_tokens(params, ids_a, mask, TINY,
                              compute_dtype=jnp.float32)
        out_b = encode_tokens(params, ids_b, mask, TINY,
                              compute_dtype=jnp.float32)
        # after mean pooling the positional signal from near-uniform
        # random-init attention is small but must be present; an
        # absolute-position-free no-RoPE encoder pools to EXACTLY the
        # same vector under token permutation
        diff = float(np.abs(np.asarray(out_a) - np.asarray(out_b)).max())
        assert diff > 1e-7, diff

    def test_default_config_is_400m_scale(self):
        cfg = stella_400m_config()
        # GTE-large-en-v1.5 backbone: ~434M params
        per_layer = (3 + 1) * cfg.hidden_size ** 2 + \
            3 * cfg.hidden_size * cfg.intermediate_size
        total = cfg.vocab_size * cfg.hidden_size + \
            cfg.num_layers * per_layer
        assert 380e6 < total < 480e6
        assert cfg.projection_dim == 1024


class TestStellaLoader:
    def test_vectorise_random_init_end_to_end(self):
        from marqo_tpu.inference import vectorise as inference
        inference.clear_loaded_models()
        props = {
            "name": "stella-tiny", "dimensions": 24, "tokens": 64,
            "type": "hf_stella", "random_init": True,
            "architecture": {"vocab_size": 128, "hidden_size": 32,
                             "num_layers": 2, "num_heads": 4,
                             "intermediate_size": 64, "rope_theta": 1000.0},
        }
        out = inference.vectorise("stella-tiny", ["hello world", "second"],
                                  model_properties=props, device="cpu")
        arr = np.asarray(out)
        assert arr.shape == (2, 24)
        np.testing.assert_allclose(np.linalg.norm(arr, axis=-1), 1.0,
                                   atol=1e-5)
        inference.clear_loaded_models()

    def test_registry_entry_resolves_and_gates_weights(self):
        from marqo_tpu.inference.model_registry import \
            get_model_properties_from_registry
        props = get_model_properties_from_registry(
            "Marqo/dunzhang-stella_en_400M_v5")
        assert props["type"] == "hf_stella"
        assert props["dimensions"] == 1024
        from marqo_tpu.core.exceptions import ModelLoadError
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.types import Device
        with pytest.raises(ModelLoadError, match="localpath"):
            load_model("Marqo/dunzhang-stella_en_400M_v5", props,
                       Device.CPU)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
