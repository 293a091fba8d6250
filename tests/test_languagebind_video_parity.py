"""LanguageBind video-tower parity: the temporal-attention CLIP variant
(reference s2_inference/languagebind/video/modeling_video.py:170-260,
698-771) vs a torch mirror of that published forward, through our
checkpoint converter (vendored HF-CLIP naming + temporal keys)."""

import math

import numpy as np
import torch

from marqo_tpu.models.languagebind import (VideoTowerConfig,
                                           encode_video_tower,
                                           init_video_tower,
                                           params_from_languagebind_video)

torch.manual_seed(0)

TINY = VideoTowerConfig(image_size=32, patch_size=8, num_frames=3,
                        add_time_attn=True, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64, projection_dim=24)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711])


def _make_state_dict(cfg: VideoTowerConfig):
    H, L = cfg.hidden_size, cfg.num_layers
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    sd = {
        "vision_model.embeddings.patch_embedding.weight":
            torch.randn(H, 3, cfg.patch_size, cfg.patch_size) * 0.05,
        "vision_model.embeddings.class_embedding": torch.randn(H) * 0.05,
        "vision_model.embeddings.position_embedding.weight":
            torch.randn(n_patches + 1, H) * 0.05,
        "vision_model.pre_layrnorm.weight": torch.ones(H),
        "vision_model.pre_layrnorm.bias": torch.zeros(H),
        "vision_model.post_layernorm.weight": torch.ones(H),
        "vision_model.post_layernorm.bias": torch.zeros(H),
        "visual_projection.weight": torch.randn(cfg.projection_dim, H) * 0.05,
    }
    for i in range(L):
        p = f"vision_model.encoder.layers.{i}."
        for attn in ("self_attn", "temporal_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[p + f"{attn}.{proj}.weight"] = torch.randn(H, H) * 0.1
                sd[p + f"{attn}.{proj}.bias"] = torch.randn(H) * 0.02
        for ln in ("layer_norm1", "layer_norm2", "temporal_layer_norm1"):
            sd[p + f"{ln}.weight"] = torch.ones(H)
            sd[p + f"{ln}.bias"] = torch.zeros(H)
        sd[p + "temporal_embedding"] = torch.randn(1, cfg.num_frames, H) * 0.05
        sd[p + "mlp.fc1.weight"] = torch.randn(cfg.intermediate_size, H) * 0.1
        sd[p + "mlp.fc1.bias"] = torch.zeros(cfg.intermediate_size)
        sd[p + "mlp.fc2.weight"] = torch.randn(H, cfg.intermediate_size) * 0.1
        sd[p + "mlp.fc2.bias"] = torch.zeros(H)
    return sd


def _torch_forward(sd, cfg: VideoTowerConfig, frames_u8: np.ndarray):
    """Mirror of the reference CLIPEncoderLayer.forward +
    CLIPVisionTransformer pooling (modeling_video.py:191-260, 768-771)."""
    B, T = frames_u8.shape[:2]
    H, NH = cfg.hidden_size, cfg.num_heads
    ps = cfg.patch_size
    x = (frames_u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    x = torch.from_numpy(x).float().reshape(B * T, cfg.image_size,
                                            cfg.image_size, 3)
    x = x.permute(0, 3, 1, 2)
    patches = torch.nn.functional.conv2d(
        x, sd["vision_model.embeddings.patch_embedding.weight"], stride=ps)
    x = patches.flatten(2).transpose(1, 2)  # (BT, N-1, H)
    cls = sd["vision_model.embeddings.class_embedding"].expand(
        B * T, 1, H)
    x = torch.cat([cls, x], dim=1)
    x = x + sd["vision_model.embeddings.position_embedding.weight"]
    x = torch.nn.functional.layer_norm(
        x, (H,), sd["vision_model.pre_layrnorm.weight"],
        sd["vision_model.pre_layrnorm.bias"], eps=cfg.layer_norm_eps)
    N = x.shape[1]

    def mha(h, p, attn):
        q = h @ sd[p + f"{attn}.q_proj.weight"].T + sd[p + f"{attn}.q_proj.bias"]
        k = h @ sd[p + f"{attn}.k_proj.weight"].T + sd[p + f"{attn}.k_proj.bias"]
        v = h @ sd[p + f"{attn}.v_proj.weight"].T + sd[p + f"{attn}.v_proj.bias"]
        b, s, _ = q.shape
        d = H // NH
        q = q.view(b, s, NH, d).transpose(1, 2)
        k = k.view(b, s, NH, d).transpose(1, 2)
        v = v.view(b, s, NH, d).transpose(1, 2)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), -1)
        ctx = (probs @ v).transpose(1, 2).reshape(b, s, H)
        return ctx @ sd[p + f"{attn}.out_proj.weight"].T + \
            sd[p + f"{attn}.out_proj.bias"]

    for i in range(cfg.num_layers):
        p = f"vision_model.encoder.layers.{i}."
        # temporal: (b t) n d -> (b n) t d, + temporal embedding, pre-LN attn
        ht = x.reshape(B, T, N, H).permute(0, 2, 1, 3).reshape(B * N, T, H)
        ht = ht + sd[p + "temporal_embedding"][:, :T, :]
        residual = ht
        normed = torch.nn.functional.layer_norm(
            ht, (H,), sd[p + "temporal_layer_norm1.weight"],
            sd[p + "temporal_layer_norm1.bias"], eps=cfg.layer_norm_eps)
        ht = residual + mha(normed, p, "temporal_attn")
        x = ht.reshape(B, N, T, H).permute(0, 2, 1, 3).reshape(B * T, N, H)
        # spatial CLIP block (pre-LN)
        residual = x
        normed = torch.nn.functional.layer_norm(
            x, (H,), sd[p + "layer_norm1.weight"], sd[p + "layer_norm1.bias"],
            eps=cfg.layer_norm_eps)
        x = residual + mha(normed, p, "self_attn")
        residual = x
        normed = torch.nn.functional.layer_norm(
            x, (H,), sd[p + "layer_norm2.weight"], sd[p + "layer_norm2.bias"],
            eps=cfg.layer_norm_eps)
        h = normed @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
        h = h * torch.sigmoid(1.702 * h)  # quick_gelu (CLIP)
        x = residual + h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]

    pooled = torch.nn.functional.layer_norm(
        x[:, 0], (H,), sd["vision_model.post_layernorm.weight"],
        sd["vision_model.post_layernorm.bias"], eps=cfg.layer_norm_eps)
    pooled = pooled.reshape(B, T, H).mean(1)
    return pooled @ sd["visual_projection.weight"].T


class TestLanguageBindVideoParity:
    def test_converted_forward_matches_torch(self):
        import jax.numpy as jnp
        sd = _make_state_dict(TINY)
        params = params_from_languagebind_video(sd, TINY, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (2, 3, 32, 32, 3)).astype(np.uint8)
        with torch.no_grad():
            expected = _torch_forward(sd, TINY, frames).numpy()
        got = np.asarray(encode_video_tower(
            params, jnp.asarray(frames), TINY, compute_dtype=jnp.float32))
        np.testing.assert_allclose(got, expected, atol=3e-5)

    def test_temporal_attention_sees_frame_order(self):
        """Swapping two frames must change the embedding when temporal
        attention is on (a frame-mean model without temporal weights is
        order-invariant)."""
        import jax
        import jax.numpy as jnp
        params = init_video_tower(TINY, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (1, 3, 32, 32, 3)).astype(np.uint8)
        swapped = frames[:, [1, 0, 2]]
        a = np.asarray(encode_video_tower(params, jnp.asarray(frames), TINY,
                                          compute_dtype=jnp.float32))
        b = np.asarray(encode_video_tower(params, jnp.asarray(swapped), TINY,
                                          compute_dtype=jnp.float32))
        assert np.abs(a - b).max() > 1e-6

    def test_no_time_attn_variant_runs(self):
        import jax
        import jax.numpy as jnp
        from dataclasses import replace
        cfg = replace(TINY, add_time_attn=False)
        params = init_video_tower(cfg, jax.random.PRNGKey(0))
        frames = jnp.zeros((1, 2, 32, 32, 3), dtype=jnp.uint8)
        out = encode_video_tower(params, frames, cfg,
                                 compute_dtype=jnp.float32)
        assert out.shape == (1, 24)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
