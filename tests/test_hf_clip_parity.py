"""roberta/xlm-roberta CLIP composite parity.

Text half: a random-init transformers XLM-R (RobertaModel) + mean pool +
the open_clip bias-free MLP projection, packaged with open_clip key
prefixes (text.transformer.*, text.proj.{0,2}.weight) — verifies the
wrapper's conversion and the jitted text forward. Vision half reuses the
open_clip ViT converter already parity-tested in test_clip_parity; here
the wrapper path is exercised end-to-end via a full composite state dict.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from transformers import RobertaConfig, RobertaModel

from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.models.hf_clip import JaxHFCLIPModel, _VISION


def _tiny_roberta(seed=0):
    torch.manual_seed(seed)
    cfg = RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu")
    return cfg, RobertaModel(cfg, add_pooling_layer=False).eval()


def _tiny_vit_sd(seed=1, width=32, layers=2, heads=2, mlp=64, patch=16,
                 image=32, proj=24):
    """open_clip-naming ViT vision half with random weights."""
    torch.manual_seed(seed)
    sd = {}
    n = (image // patch) ** 2
    sd["visual.conv1.weight"] = 0.02 * torch.randn(width, 3, patch, patch)
    sd["visual.class_embedding"] = 0.02 * torch.randn(width)
    sd["visual.positional_embedding"] = 0.02 * torch.randn(n + 1, width)
    sd["visual.ln_pre.weight"] = torch.ones(width)
    sd["visual.ln_pre.bias"] = torch.zeros(width)
    for i in range(layers):
        b = f"visual.transformer.resblocks.{i}"
        sd[f"{b}.attn.in_proj_weight"] = 0.02 * torch.randn(3 * width, width)
        sd[f"{b}.attn.in_proj_bias"] = torch.zeros(3 * width)
        sd[f"{b}.attn.out_proj.weight"] = 0.02 * torch.randn(width, width)
        sd[f"{b}.attn.out_proj.bias"] = torch.zeros(width)
        sd[f"{b}.ln_1.weight"] = torch.ones(width)
        sd[f"{b}.ln_1.bias"] = torch.zeros(width)
        sd[f"{b}.mlp.c_fc.weight"] = 0.02 * torch.randn(mlp, width)
        sd[f"{b}.mlp.c_fc.bias"] = torch.zeros(mlp)
        sd[f"{b}.mlp.c_proj.weight"] = 0.02 * torch.randn(width, mlp)
        sd[f"{b}.mlp.c_proj.bias"] = torch.zeros(width)
        sd[f"{b}.ln_2.weight"] = torch.ones(width)
        sd[f"{b}.ln_2.bias"] = torch.zeros(width)
    sd["visual.ln_post.weight"] = torch.ones(width)
    sd["visual.ln_post.bias"] = torch.zeros(width)
    sd["visual.proj"] = 0.02 * torch.randn(width, proj)
    return sd


@pytest.fixture(scope="module")
def composite(tmp_path_factory):
    cfg, roberta = _tiny_roberta()
    torch.manual_seed(2)
    proj = nn.Sequential(nn.Linear(32, 28, bias=False), nn.GELU(),
                         nn.Linear(28, 24, bias=False)).eval()
    sd = {}
    for k, v in roberta.state_dict().items():
        sd[f"text.transformer.{k}"] = v
    sd["text.proj.0.weight"] = proj[0].weight.data
    sd["text.proj.2.weight"] = proj[2].weight.data
    sd.update(_tiny_vit_sd())
    ckdir = tmp_path_factory.mktemp("ck")
    path = ckdir / "xlmr_vit_tiny.pt"
    torch.save(sd, str(path))
    from marqo_tpu.models.tokenizer import TextTokenizer
    TextTokenizer.build_test_wordpiece()._tok.save(
        str(ckdir / "tokenizer.json"))

    model = JaxHFCLIPModel(
        "open_clip/xlm-roberta-base-ViT-B-32/laion5b_s13b_b90k",
        {"name": "open_clip/xlm-roberta-base-ViT-B-32/laion5b_s13b_b90k",
         "localpath": str(path), "dimensions": 24,
         "architecture": {"text_heads": 2}}, Device.CPU)
    # tiny vision config matching _tiny_vit_sd
    import marqo_tpu.models.hf_clip as hc
    from marqo_tpu.models.clip import CLIPVisionConfig
    orig = dict(hc._VISION)
    hc._VISION["ViT-B-32"] = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=32, num_layers=2,
        num_heads=2, intermediate_size=64, projection_dim=24,
        hidden_act="gelu")
    try:
        model.compute_dtype = jnp.float32
        model.load()
    finally:
        hc._VISION.clear()
        hc._VISION.update(orig)
    return roberta, proj, model


class TestHFCLIPParity:
    def test_text_half(self, composite):
        roberta, proj, model = composite
        rng = np.random.default_rng(4)
        ids = rng.integers(2, 120, size=(3, 12)).astype(np.int64)
        mask = np.ones_like(ids)
        mask[1, 8:] = 0
        ids[1, 8:] = 1  # pad token
        mask[2, 4:] = 0
        ids[2, 4:] = 1
        with torch.no_grad():
            hidden = roberta(input_ids=torch.from_numpy(ids),
                             attention_mask=torch.from_numpy(mask)
                             ).last_hidden_state
            m = torch.from_numpy(mask).unsqueeze(-1).float()
            pooled = (hidden * m).sum(1) / m.sum(1)
            ref = proj(pooled)
        from marqo_tpu.models.hf_clip import encode_hf_clip_text_jit
        out = encode_hf_clip_text_jit(
            model.params, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)), model.text_config,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)

    def test_encode_both_modalities(self, composite):
        _, _, model = composite
        out = model.encode(["hello world"], modality=Modality.TEXT)
        assert out.shape == (1, 24)
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 24)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-5)

    def test_loader_dispatch(self):
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.model_registry import (
            get_model_properties_from_registry)
        props = dict(get_model_properties_from_registry(
            "open_clip/roberta-ViT-B-32/laion2b_s12b_b32k"))
        props.update({"random_init": True, "dimensions": 24,
                      "image_size": 32,
                      "architecture": {"patch_size": 16, "vocab_size": 64}})
        model = load_model("open_clip/roberta-ViT-B-32/laion2b_s12b_b32k",
                           props, Device.CPU)
        assert isinstance(model, JaxHFCLIPModel)
        assert model.encode(["x"]).shape == (1, 24)


class TestMCLIP:
    def test_mclip_text_parity_and_separate_vision(self, tmp_path):
        """M-CLIP layout: transformer.<xlmr> + LinearTransformation text
        checkpoint, image tower from a separate open_clip-format file
        (reference MULTILINGUAL_CLIP, clip_utils.py:521)."""
        cfg, roberta = _tiny_roberta(seed=7)
        torch.manual_seed(8)
        lin = nn.Linear(32, 24).eval()
        sd = {f"transformer.{k}": v for k, v in
              roberta.state_dict().items()}
        sd["LinearTransformation.weight"] = lin.weight.data
        sd["LinearTransformation.bias"] = lin.bias.data
        tpath = tmp_path / "mclip_text.pt"
        torch.save(sd, str(tpath))
        from marqo_tpu.models.tokenizer import TextTokenizer
        TextTokenizer.build_test_wordpiece()._tok.save(
            str(tmp_path / "tokenizer.json"))
        vpath = tmp_path / "clip_vision.pt"
        torch.save(_tiny_vit_sd(seed=9), str(vpath))

        import marqo_tpu.models.hf_clip as hc
        from marqo_tpu.models.clip import CLIPVisionConfig
        orig = dict(hc._VISION)
        hc._VISION["Vit-B/32"] = CLIPVisionConfig(
            image_size=32, patch_size=16, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, projection_dim=24,
            hidden_act="gelu")
        model = JaxHFCLIPModel(
            "multilingual-clip/XLM-R Large Vit-B/32",
            {"name": "multilingual-clip/XLM-R Large Vit-B/32",
             "localpath": str(tpath), "vision_localpath": str(vpath),
             "dimensions": 24, "architecture": {"text_heads": 2}},
            Device.CPU)
        try:
            model.compute_dtype = jnp.float32
            model.load()
        finally:
            hc._VISION.clear()
            hc._VISION.update(orig)

        rng = np.random.default_rng(10)
        ids = rng.integers(2, 120, size=(2, 9)).astype(np.int64)
        mask = np.ones_like(ids)
        mask[1, 5:] = 0
        ids[1, 5:] = 1
        with torch.no_grad():
            hidden = roberta(input_ids=torch.from_numpy(ids),
                             attention_mask=torch.from_numpy(mask)
                             ).last_hidden_state
            m = torch.from_numpy(mask).unsqueeze(-1).float()
            ref = lin((hidden * m).sum(1) / m.sum(1))
        from marqo_tpu.models.hf_clip import encode_hf_clip_text_jit
        out = encode_hf_clip_text_jit(
            model.params, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)), model.text_config,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        assert model.encode([img], modality=Modality.IMAGE).shape == (1, 24)

    def test_mclip_dispatch(self):
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.model_registry import (
            get_model_properties_from_registry)
        props = dict(get_model_properties_from_registry(
            "multilingual-clip/XLM-R Large Vit-B/32"))
        props.update({"random_init": True, "dimensions": 24,
                      "image_size": 32,
                      "architecture": {"patch_size": 16, "vocab_size": 64}})
        model = load_model("multilingual-clip/XLM-R Large Vit-B/32",
                           props, Device.CPU)
        assert isinstance(model, JaxHFCLIPModel)
        assert model.encode(["bonjour"]).shape == (1, 24)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
