"""CoCa architecture parity vs a torch mirror of open_clip semantics.

The mirror implements open_clip's CoCa (coca_model.py / transformer.py)
exactly — TextTransformer with an appended CLS embedding and its
left-padded cls mask, AttentionalPooler with kdim != d_model, and the
MultimodalTransformer decoder (causal self-attn + cross-attn per layer) —
with state-dict key names matching open_clip, so the test covers both the
converter (params_from_open_clip_coca) and the JAX forward math.
Random-init weights (no hub egress), fp32, tolerance 1e-4.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from marqo_tpu.models.coca import (CoCaDecoderConfig, CoCaTextConfig,
                                   CoCaVisionConfig, coca_decode_logits,
                                   encode_coca_image, encode_coca_text,
                                   params_from_open_clip_coca)
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

torch.manual_seed(0)

# tiny dims: text H=32/2L, vision Hv=48/2L patch16 img32. embed_dim must
# equal the text/decoder width — open_clip feeds the attn-pooled image
# tokens straight into the decoder's width-sized cross-attention.
TEXT = CoCaTextConfig(vocab_size=50, hidden_size=32, num_layers=2,
                      num_heads=2, intermediate_size=64, context_length=12,
                      embed_dim=32, pad_id=0)
VIS = CoCaVisionConfig(image_size=32, patch_size=16, hidden_size=48,
                       num_layers=2, num_heads=2, intermediate_size=96,
                       embed_dim=32, n_queries=6, pooler_heads=2)
DEC = CoCaDecoderConfig(vocab_size=50, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64,
                        context_length=12)


class Block(nn.Module):
    """open_clip ResidualAttentionBlock (optionally cross-attention)."""

    def __init__(self, h, heads, mlp, cross=False):
        super().__init__()
        self.ln_1 = nn.LayerNorm(h)
        if cross:
            self.ln_1_kv = nn.LayerNorm(h)
        self.attn = nn.MultiheadAttention(h, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(h)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(h, mlp))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp, h))
        self.cross = cross

    def forward(self, x, kv=None, attn_mask=None):
        q = self.ln_1(x)
        k = self.ln_1_kv(kv) if self.cross else q
        x = x + self.attn(q, k, k, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class TextTower(nn.Module):
    def __init__(self, cfg: CoCaTextConfig):
        super().__init__()
        h = cfg.hidden_size
        self.cfg = cfg
        self.token_embedding = nn.Embedding(cfg.vocab_size, h)
        self.positional_embedding = nn.Parameter(
            0.02 * torch.randn(cfg.context_length + 1, h))
        self.cls_emb = nn.Parameter(0.02 * torch.randn(h))
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [Block(h, cfg.num_heads, cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.ln_final = nn.LayerNorm(h)
        self.text_projection = nn.Parameter(
            0.02 * torch.randn(h, cfg.embed_dim))

    def build_cls_mask(self, text):
        # verbatim open_clip TextTransformer.build_cls_mask
        cls_mask = (text != self.cfg.pad_id).unsqueeze(1)
        cls_mask = F.pad(cls_mask, (1, 0, cls_mask.shape[2], 0), value=True)
        additive = torch.zeros(cls_mask.shape, dtype=torch.float32)
        additive.masked_fill_(~cls_mask, float("-inf"))
        return torch.repeat_interleave(additive, self.cfg.num_heads, 0)

    def forward(self, text):
        B, S = text.shape
        x = self.token_embedding(text)
        x = torch.cat(
            [x, self.cls_emb[None, None, :].expand(B, 1, -1)], dim=1)
        T = S + 1
        causal = torch.full((T, T), float("-inf")).triu(1)
        # open_clip adds causal[None] to the (B*heads, T, T) cls mask
        mask = self.build_cls_mask(text) + causal[None]
        x = x + self.positional_embedding[:T]
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        pooled, tokens = x[:, -1], x[:, :-1]
        pooled = self.ln_final(pooled)
        return pooled @ self.text_projection, tokens


class AttentionalPooler(nn.Module):
    def __init__(self, d, ctx_dim, heads, n_q):
        super().__init__()
        self.query = nn.Parameter(0.02 * torch.randn(n_q, d))
        self.attn = nn.MultiheadAttention(d, heads, kdim=ctx_dim,
                                          vdim=ctx_dim)
        self.ln_q = nn.LayerNorm(d)
        self.ln_k = nn.LayerNorm(ctx_dim)

    def forward(self, x):
        x = self.ln_k(x).permute(1, 0, 2)
        N = x.shape[1]
        q = self.ln_q(self.query)
        out = self.attn(q.unsqueeze(1).expand(-1, N, -1), x, x,
                        need_weights=False)[0]
        return out.permute(1, 0, 2)


class VisionTower(nn.Module):
    def __init__(self, cfg: CoCaVisionConfig):
        super().__init__()
        h = cfg.hidden_size
        self.cfg = cfg
        self.conv1 = nn.Conv2d(3, h, cfg.patch_size, stride=cfg.patch_size,
                               bias=False)
        n = (cfg.image_size // cfg.patch_size) ** 2
        self.class_embedding = nn.Parameter(0.02 * torch.randn(h))
        self.positional_embedding = nn.Parameter(0.02 * torch.randn(n + 1, h))
        self.ln_pre = nn.LayerNorm(h)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [Block(h, cfg.num_heads, cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.attn_pool = AttentionalPooler(cfg.embed_dim, h,
                                           cfg.pooler_heads, cfg.n_queries)
        self.ln_post = nn.LayerNorm(cfg.embed_dim)
        self.proj = nn.Parameter(0.02 * torch.randn(cfg.embed_dim,
                                                    cfg.embed_dim))

    def forward(self, pixels):  # pixels: (B, 3, S, S) normalized float
        x = self.conv1(pixels)
        B, H = x.shape[0], x.shape[1]
        x = x.reshape(B, H, -1).permute(0, 2, 1)
        x = torch.cat(
            [self.class_embedding[None, None, :].expand(B, 1, -1), x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.attn_pool(x)
        x = self.ln_post(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        return pooled @ self.proj, tokens


class TextDecoder(nn.Module):
    def __init__(self, cfg: CoCaDecoderConfig):
        super().__init__()
        h = cfg.hidden_size
        self.cfg = cfg
        self.resblocks = nn.ModuleList(
            [Block(h, cfg.num_heads, cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.cross_attn = nn.ModuleList(
            [Block(h, cfg.num_heads, cfg.intermediate_size, cross=True)
             for _ in range(cfg.num_layers)])
        self.ln_final = nn.LayerNorm(h)
        self.text_projection = nn.Parameter(
            0.02 * torch.randn(h, cfg.vocab_size))

    def forward(self, image_embs, text_embs):
        S = text_embs.shape[1]
        causal = torch.full((S, S), float("-inf")).triu(1)
        for blk, cross in zip(self.resblocks, self.cross_attn):
            text_embs = blk(text_embs, attn_mask=causal)
            text_embs = cross(text_embs, kv=image_embs)
        x = self.ln_final(text_embs)
        return x @ self.text_projection


class CoCaMirror(nn.Module):
    def __init__(self):
        super().__init__()
        self.text = TextTower(TEXT)
        self.visual = VisionTower(VIS)
        self.text_decoder = TextDecoder(DEC)


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(7)
    mirror = CoCaMirror().eval()
    params = params_from_open_clip_coca(
        mirror.state_dict(), TEXT, VIS, DEC, dtype=jnp.float32)
    return mirror, params


def _text_ids():
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 50, size=(4, TEXT.context_length)).astype(np.int32)
    # ragged: zero-pad tails of varying length (pad_id=0)
    for i, L in enumerate([12, 9, 5, 1]):
        ids[i, L:] = 0
    return ids


def _pixels():
    rng = np.random.default_rng(4)
    return rng.integers(0, 256, size=(3, 32, 32, 3)).astype(np.uint8)


class TestCoCaParity:
    def test_text_tower(self, mirror_and_params):
        mirror, params = mirror_and_params
        ids = _text_ids()
        with torch.no_grad():
            ref, ref_tokens = mirror.text(torch.from_numpy(ids).long())
        out, tokens = encode_coca_text(params, jnp.asarray(ids), TEXT,
                                       compute_dtype=jnp.float32,
                                       return_tokens=True)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                                   atol=1e-4, rtol=1e-4)

    def test_vision_tower(self, mirror_and_params):
        mirror, params = mirror_and_params
        u8 = _pixels()
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        with torch.no_grad():
            ref, ref_tokens = mirror.visual(
                torch.from_numpy(x.transpose(0, 3, 1, 2)).float())
        out, tokens = encode_coca_image(params, jnp.asarray(u8), VIS,
                                        compute_dtype=jnp.float32,
                                        return_tokens=True)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                                   atol=1e-4, rtol=1e-4)

    def test_decoder(self, mirror_and_params):
        mirror, params = mirror_and_params
        ids = _text_ids()[:3]
        u8 = _pixels()
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        with torch.no_grad():
            _, text_tokens = mirror.text(torch.from_numpy(ids).long())
            _, img_tokens = mirror.visual(
                torch.from_numpy(x.transpose(0, 3, 1, 2)).float())
            ref = mirror.text_decoder(img_tokens, text_tokens)
        _, jt = encode_coca_text(params, jnp.asarray(ids), TEXT,
                                 compute_dtype=jnp.float32,
                                 return_tokens=True)
        _, ji = encode_coca_image(params, jnp.asarray(u8), VIS,
                                  compute_dtype=jnp.float32,
                                  return_tokens=True)
        logits = coca_decode_logits(params, jt, ji, DEC,
                                    compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(logits), ref.numpy(),
                                   atol=1e-3, rtol=1e-3)

    def test_cls_mask_shift_matters(self, mirror_and_params):
        """The left-padded cls gate is part of the contract: a wrong
        (unshifted) mask must produce a different embedding for ragged
        inputs, proving the test would catch the off-by-one."""
        mirror, _ = mirror_and_params
        ids = _text_ids()
        with torch.no_grad():
            ref, _ = mirror.text(torch.from_numpy(ids).long())
        # full-length rows are unaffected by the shift; ragged rows must be
        assert ids[2, 5:].sum() == 0
        with torch.no_grad():
            full, _ = mirror.text(
                torch.from_numpy(np.where(ids == 0, 1, ids)).long())
        assert not np.allclose(ref[2].numpy(), full[2].numpy(), atol=1e-5)


class TestCoCaModelWrapper:
    def test_random_init_encode(self):
        from marqo_tpu.inference.types import Device
        from marqo_tpu.models.coca import JaxCoCaModel
        model = JaxCoCaModel(
            "open_clip/coca_ViT-B-32/laion2b_s13b_b90k",
            {"random_init": True, "dimensions": 16, "image_size": 32,
             "architecture": {"patch_size": 16, "vocab_size": 64}},
            Device.CPU)
        model.load()
        from marqo_tpu.inference.types import Modality
        out = model.encode(["a cat", "two dogs"], modality=Modality.TEXT)
        assert out.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-5)
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 16)

    def test_loader_dispatch(self):
        """Registry coca_* names route to the CoCa arch, not plain CLIP
        (reference loads them via open_clip create_model,
        open_clip_model.py:28; the state dict is a different shape)."""
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.model_registry import (
            get_model_properties_from_registry)
        from marqo_tpu.inference.types import Device
        from marqo_tpu.models.coca import JaxCoCaModel
        props = dict(get_model_properties_from_registry(
            "open_clip/coca_ViT-B-32/laion2b_s13b_b90k"))
        props.update({"random_init": True, "dimensions": 16,
                      "image_size": 32,
                      "architecture": {"patch_size": 16, "vocab_size": 64}})
        model = load_model("open_clip/coca_ViT-B-32/laion2b_s13b_b90k",
                           props, Device.CPU)
        assert isinstance(model, JaxCoCaModel)
        assert model.encode(["x"]).shape == (1, 16)

    def test_caption_logits_shape(self):
        from marqo_tpu.inference.types import Device
        from marqo_tpu.models.coca import JaxCoCaModel
        model = JaxCoCaModel(
            "open_clip/coca_ViT-B-32/laion2b_s13b_b90k",
            {"random_init": True, "dimensions": 16, "image_size": 32,
             "architecture": {"patch_size": 16, "vocab_size": 64,
                              "context_length": 12}},
            Device.CPU)
        model.load()
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        logits = model.caption_logits(["a cat"], [img])
        assert logits.shape == (1, 12, 64)


class TestCoCaGeneration:
    def test_greedy_caption_generation(self):
        """Greedy decode: deterministic, grows from <sot>, respects
        max_len and eos, one caption per image."""
        from marqo_tpu.inference.types import Device
        from marqo_tpu.models.coca import JaxCoCaModel
        model = JaxCoCaModel(
            "open_clip/coca_ViT-B-32/laion2b_s13b_b90k",
            {"random_init": True, "dimensions": 16, "image_size": 32,
             "architecture": {"patch_size": 16, "vocab_size": 64,
                              "context_length": 12}},
            Device.CPU)
        model.load()
        imgs = [np.zeros((32, 32, 3), dtype=np.uint8),
                np.full((32, 32, 3), 255, dtype=np.uint8)]
        caps = model.generate_caption_ids(imgs, max_len=6, sot_id=1)
        assert len(caps) == 2
        for cap in caps:
            assert cap[0] == 1 and 2 <= len(cap) <= 6
            assert all(0 <= t < 64 for t in cap)
        # deterministic
        caps2 = model.generate_caption_ids(imgs, max_len=6, sot_id=1)
        assert caps == caps2
        # different images ⇒ (random-init weights) different captions
        assert caps[0] != caps[1] or len(set(caps[0])) == 1

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
