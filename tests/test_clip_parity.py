"""Numerical parity of the JAX CLIP towers vs. torch/HF CLIPModel (random
init — verifies architecture + conversion exactly, checkpoint-independent)."""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
from transformers import CLIPConfig, CLIPModel

from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                   JaxCLIPModel, encode_clip_image,
                                   encode_clip_text, params_from_hf_clip)


@pytest.fixture(scope="module")
def clip_pair():
    torch.manual_seed(0)
    hf_config = CLIPConfig(
        text_config={"vocab_size": 128, "hidden_size": 32,
                     "num_hidden_layers": 2, "num_attention_heads": 2,
                     "intermediate_size": 64,
                     "max_position_embeddings": 16, "eos_token_id": 127,
                     "bos_token_id": 126, "pad_token_id": 0},
        vision_config={"image_size": 32, "patch_size": 8, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64},
        projection_dim=24,
    )
    torch_model = CLIPModel(hf_config).eval()
    text_config = CLIPTextConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_positions=16, projection_dim=24,
        eos_token_id=127)
    vision_config = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=2, intermediate_size=64, projection_dim=24)
    params = params_from_hf_clip(torch_model.state_dict(), text_config,
                                 vision_config)
    return torch_model, text_config, vision_config, params


class TestCLIPTextParity:
    def test_text_tower(self, clip_pair):
        torch_model, text_config, _, params = clip_pair
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 126, size=(3, 12)).astype(np.int64)
        ids[:, -1] = 127  # EOS
        with torch.no_grad():
            ref = torch_model.get_text_features(
                input_ids=torch.tensor(ids),
                attention_mask=torch.ones_like(torch.tensor(ids))).numpy()
        ours = np.asarray(encode_clip_text(
            params, jnp.asarray(ids.astype(np.int32)), text_config,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_eos_pooling_midsequence(self, clip_pair):
        """EOS not at the last position (padded sequences)."""
        torch_model, text_config, _, params = clip_pair
        rng = np.random.default_rng(1)
        ids = rng.integers(1, 126, size=(2, 12)).astype(np.int64)
        ids[0, 6] = 127
        ids[0, 7:] = 0
        ids[1, -1] = 127
        with torch.no_grad():
            ref = torch_model.get_text_features(
                input_ids=torch.tensor(ids)).numpy()
        ours = np.asarray(encode_clip_text(
            params, jnp.asarray(ids.astype(np.int32)), text_config,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


class TestCLIPVisionParity:
    def test_vision_tower(self, clip_pair):
        torch_model, _, vision_config, params = clip_pair
        rng = np.random.default_rng(2)
        pixels_u8 = rng.integers(0, 256, size=(2, 32, 32, 3)).astype(np.uint8)
        # reference path: torchvision-style normalize on float pixels
        from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD
        x = pixels_u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        torch_pixels = torch.tensor(x.transpose(0, 3, 1, 2), dtype=torch.float32)
        with torch.no_grad():
            ref = torch_model.get_image_features(pixel_values=torch_pixels).numpy()
        ours = np.asarray(encode_clip_image(
            params, jnp.asarray(pixels_u8), vision_config,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)

    def test_bf16_cosine_within_1e3(self, clip_pair):
        torch_model, _, vision_config, params = clip_pair
        rng = np.random.default_rng(3)
        pixels_u8 = rng.integers(0, 256, size=(2, 32, 32, 3)).astype(np.uint8)
        from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD
        x = pixels_u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        with torch.no_grad():
            ref = torch_model.get_image_features(
                pixel_values=torch.tensor(x.transpose(0, 3, 1, 2),
                                          dtype=torch.float32)).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        ours = np.asarray(encode_clip_image(
            params, jnp.asarray(pixels_u8), vision_config,
            compute_dtype=jnp.bfloat16))
        ours = ours / np.linalg.norm(ours, axis=-1, keepdims=True)
        cos = (ref * ours).sum(-1)
        assert np.all(cos > 1 - 1e-3), cos


class TestJaxCLIPModelWrapper:
    @pytest.fixture
    def model(self):
        m = JaxCLIPModel("test-clip", {"type": "clip", "dimensions": 24,
                                       "random_init": True, "image_size": 32,
                                       "architecture": {"patch_size": 8}},
                         Device.CPU)
        m.load()
        return m

    def test_text_encode(self, model):
        out = model.encode(["hello world", "goodbye"], modality=Modality.TEXT)
        assert out.shape == (2, 24)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)

    def test_image_encode_ndarray(self, model):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 24)

    def test_image_encode_pil(self, model):
        from PIL import Image
        img = Image.new("RGB", (100, 40), color=(200, 30, 30))
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 24)

    def test_text_image_same_space(self, model):
        t = model.encode(["red square"], modality=Modality.TEXT)
        from PIL import Image
        img = Image.new("RGB", (64, 64), color=(255, 0, 0))
        v = model.encode([img], modality=Modality.IMAGE)
        assert t.shape == v.shape

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
