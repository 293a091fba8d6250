"""SigLIP parity vs a torch mirror of open_clip/timm semantics.

Mirror key names match the open_clip SigLIP state dict (text.* open_clip
TextTransformer naming; visual.trunk.* timm vit_siglip naming incl. the
AttentionPoolLatent head), covering both the converter
(params_from_open_clip_siglip) and the JAX forward math. fp32, 1e-4.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from marqo_tpu.models.siglip import (SIGLIP_MEAN, SIGLIP_STD,
                                     SigLIPTextConfig, SigLIPVisionConfig,
                                     encode_siglip_image, encode_siglip_text,
                                     params_from_open_clip_siglip)

TEXT = SigLIPTextConfig(vocab_size=60, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64, context_length=10,
                        embed_dim=24)
VIS = SigLIPVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                         num_layers=2, num_heads=2, intermediate_size=64)

EPS = 1e-6


class OpenClipBlock(nn.Module):
    """open_clip ResidualAttentionBlock (ln_1/ln_2, attn, mlp.c_fc/c_proj)."""

    def __init__(self, h, heads, mlp):
        super().__init__()
        self.ln_1 = nn.LayerNorm(h, eps=EPS)
        self.attn = nn.MultiheadAttention(h, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(h, eps=EPS)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(h, mlp))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp, h))

    def forward(self, x):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class TimmBlock(nn.Module):
    """timm ViT block (norm1/norm2, attn.qkv/attn.proj, mlp.fc1/fc2)."""

    def __init__(self, h, heads, mlp):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(h, eps=EPS)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(h, 3 * h)
        self.attn.proj = nn.Linear(h, h)
        self.norm2 = nn.LayerNorm(h, eps=EPS)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(h, mlp)
        self.mlp.fc2 = nn.Linear(mlp, h)

    def forward(self, x):
        B, N, C = x.shape
        D = C // self.heads
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, D)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(a)
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class TextTower(nn.Module):
    """open_clip TextTransformer: no causal mask, ln_final then last-token
    pool, Linear projection with bias."""

    def __init__(self, cfg: SigLIPTextConfig):
        super().__init__()
        h = cfg.hidden_size
        self.token_embedding = nn.Embedding(cfg.vocab_size, h)
        self.positional_embedding = nn.Parameter(
            0.02 * torch.randn(cfg.context_length, h))
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [OpenClipBlock(h, cfg.num_heads, cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.ln_final = nn.LayerNorm(h, eps=EPS)
        self.text_projection = nn.Linear(h, cfg.embed_dim)

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.ln_final(x)
        return self.text_projection(x[:, -1])


class AttentionPoolLatent(nn.Module):
    """timm AttentionPoolLatent (latent_len=1, residual MLP, token pool)."""

    def __init__(self, h, heads, mlp):
        super().__init__()
        self.heads = heads
        self.latent = nn.Parameter(0.02 * torch.randn(1, 1, h))
        self.q = nn.Linear(h, h)
        self.kv = nn.Linear(h, 2 * h)
        self.proj = nn.Linear(h, h)
        self.norm = nn.LayerNorm(h, eps=EPS)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(h, mlp)
        self.mlp.fc2 = nn.Linear(mlp, h)

    def forward(self, x):
        B, N, C = x.shape
        D = C // self.heads
        q = self.q(self.latent.expand(B, -1, -1)).reshape(
            B, 1, self.heads, D).transpose(1, 2)
        kv = self.kv(x).reshape(B, N, 2, self.heads, D).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(B, 1, C)
        a = self.proj(a)
        a = a + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm(a))))
        return a[:, 0]


class VisionTrunk(nn.Module):
    def __init__(self, cfg: SigLIPVisionConfig):
        super().__init__()
        h = cfg.hidden_size
        n = (cfg.image_size // cfg.patch_size) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, h, cfg.patch_size,
                                          stride=cfg.patch_size)
        self.pos_embed = nn.Parameter(0.02 * torch.randn(1, n, h))
        self.blocks = nn.ModuleList(
            [TimmBlock(h, cfg.num_heads, cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.norm = nn.LayerNorm(h, eps=EPS)
        self.attn_pool = AttentionPoolLatent(h, cfg.num_heads,
                                             cfg.intermediate_size)

    def forward(self, pixels):  # (B, 3, S, S) normalized float
        x = self.patch_embed.proj(pixels)
        B, H = x.shape[0], x.shape[1]
        x = x.reshape(B, H, -1).permute(0, 2, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.attn_pool(x)


class SigLIPMirror(nn.Module):
    def __init__(self):
        super().__init__()
        self.text = TextTower(TEXT)
        self.visual = nn.Module()
        self.visual.trunk = VisionTrunk(VIS)


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(11)
    mirror = SigLIPMirror().eval()
    params = params_from_open_clip_siglip(
        mirror.state_dict(), TEXT, VIS, dtype=jnp.float32)
    return mirror, params


class TestSigLIPParity:
    def test_text_tower(self, mirror_and_params):
        mirror, params = mirror_and_params
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 60, size=(4, 10)).astype(np.int32)
        with torch.no_grad():
            ref = mirror.text(torch.from_numpy(ids).long())
        out = encode_siglip_text(params, jnp.asarray(ids), TEXT,
                                 compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)

    def test_vision_tower(self, mirror_and_params):
        mirror, params = mirror_and_params
        rng = np.random.default_rng(6)
        u8 = rng.integers(0, 256, size=(3, 32, 32, 3)).astype(np.uint8)
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(SIGLIP_MEAN)) / np.asarray(SIGLIP_STD)
        with torch.no_grad():
            ref = mirror.visual.trunk(
                torch.from_numpy(x.transpose(0, 3, 1, 2)).float())
        out = encode_siglip_image(params, jnp.asarray(u8), VIS,
                                  compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestSigLIPWrapper:
    def test_random_init_encode_and_dispatch(self):
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.model_registry import (
            get_model_properties_from_registry)
        from marqo_tpu.inference.types import Device, Modality
        from marqo_tpu.models.siglip import JaxSigLIPModel
        props = dict(get_model_properties_from_registry(
            "open_clip/ViT-B-16-SigLIP/webli"))
        props.update({"random_init": True, "dimensions": 32,
                      "image_size": 32,
                      "architecture": {"patch_size": 16, "vocab_size": 64}})
        model = load_model("open_clip/ViT-B-16-SigLIP/webli", props,
                           Device.CPU)
        assert isinstance(model, JaxSigLIPModel)
        out = model.encode(["hello", "two dogs"], modality=Modality.TEXT)
        assert out.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-5)
        img = np.zeros((40, 24, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 32)

    def test_image_size_not_divisible_by_patch(self):
        """SO400M-14 at 384px: 384 % 14 != 0 — conv-stride semantics floor
        to a 27x27 grid; the reshape path must crop, not crash."""
        from marqo_tpu.inference.types import Device, Modality
        from marqo_tpu.models.siglip import JaxSigLIPModel
        model = JaxSigLIPModel(
            "open_clip/ViT-SO400M-14-SigLIP-384/webli",
            {"random_init": True, "dimensions": 16, "image_size": 36,
             "architecture": {"patch_size": 16, "vocab_size": 64}},
            Device.CPU)
        model.load()
        img = np.zeros((36, 36, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 16)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
