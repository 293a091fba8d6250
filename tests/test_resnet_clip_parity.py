"""ResNet-CLIP vision tower parity vs a torch mirror of openai/open_clip
ModifiedResNet semantics (3-conv stem, avgpool-before-conv bottleneck
downsampling, AttentionPool2d with mean query), with state-dict key names
matching the real checkpoints so the converter is covered too. fp32, 1e-4.
"""

from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from marqo_tpu.models.resnet_clip import (ResNetVisionConfig,
                                          encode_resnet_clip_image,
                                          resnet_vision_params_from_torch)
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

CFG = ResNetVisionConfig(layers=(1, 1, 1, 1), width=16, image_size=64,
                         output_dim=24, heads=2)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride) if stride > 1
                 else nn.Identity()),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1,
                                bias=False)),
                ("1", nn.BatchNorm2d(planes * 4))]))

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        # NCHW -> (HW)NC, prepend mean token (openai clip model.py)
        x = x.flatten(start_dim=2).permute(2, 0, 1)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                    self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False,
            need_weights=False)
        return out.squeeze(0)


class ModifiedResNet(nn.Module):
    def __init__(self, cfg: ResNetVisionConfig):
        super().__init__()
        w = cfg.width
        self.conv1 = nn.Conv2d(3, w // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(w // 2)
        self.conv2 = nn.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(w // 2)
        self.conv3 = nn.Conv2d(w // 2, w, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(w)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = w
        self.layer1 = self._make_layer(w, cfg.layers[0])
        self.layer2 = self._make_layer(w * 2, cfg.layers[1], stride=2)
        self.layer3 = self._make_layer(w * 4, cfg.layers[2], stride=2)
        self.layer4 = self._make_layer(w * 8, cfg.layers[3], stride=2)
        self.attnpool = AttentionPool2d(cfg.image_size // 32, w * 32,
                                        cfg.heads, cfg.output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(Bottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(21)
    mirror = ModifiedResNet(CFG).eval()
    # randomize BN running stats so the conversion of mean/var is covered
    with torch.no_grad():
        for m in mirror.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd_np = {"visual." + k: v.numpy() for k, v in
             mirror.state_dict().items()}
    params = resnet_vision_params_from_torch(sd_np, CFG, dtype=jnp.float32)
    return mirror, params


class TestResNetCLIPParity:
    def test_vision_tower(self, mirror_and_params):
        mirror, params = mirror_and_params
        rng = np.random.default_rng(8)
        u8 = rng.integers(0, 256, size=(3, 64, 64, 3)).astype(np.uint8)
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        with torch.no_grad():
            ref = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)).float())
        out = encode_resnet_clip_image(params, jnp.asarray(u8), CFG,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestResNetCLIPWrapper:
    def test_random_init_encode_and_dispatch(self):
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.model_registry import (
            get_model_properties_from_registry)
        from marqo_tpu.inference.types import Device, Modality
        from marqo_tpu.models.resnet_clip import JaxResNetCLIPModel
        props = dict(get_model_properties_from_registry(
            "open_clip/RN50/openai"))
        props.update({"random_init": True, "dimensions": 24,
                      "image_size": 64,
                      "architecture": {"width": 16, "vocab_size": 64,
                                       "heads": 2}})
        model = load_model("open_clip/RN50/openai", props, Device.CPU)
        assert isinstance(model, JaxResNetCLIPModel)
        out = model.encode(["a cat", "two dogs"], modality=Modality.TEXT)
        assert out.shape == (2, 24)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-5)
        img = np.zeros((80, 48, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 24)

    def test_full_checkpoint_conversion_via_localpath(self, tmp_path):
        """End-to-end: save a full (text+vision) openai-naming state dict,
        load through the wrapper's checkpoint path, encode both ways."""
        import torch as _t

        from marqo_tpu.inference.types import Device, Modality
        from marqo_tpu.models.resnet_clip import JaxResNetCLIPModel

        class TextHalf(nn.Module):
            def __init__(self, vocab, w, L, heads, mlp, ctx, embed):
                super().__init__()
                self.token_embedding = nn.Embedding(vocab, w)
                self.positional_embedding = nn.Parameter(
                    0.02 * torch.randn(ctx, w))
                self.transformer = nn.Module()
                self.transformer.resblocks = nn.ModuleList()
                for _ in range(L):
                    blk = nn.Module()
                    blk.attn = nn.MultiheadAttention(w, heads,
                                                     batch_first=True)
                    blk.ln_1 = nn.LayerNorm(w)
                    blk.ln_2 = nn.LayerNorm(w)
                    blk.mlp = nn.Sequential()
                    blk.mlp.add_module("c_fc", nn.Linear(w, mlp))
                    blk.mlp.add_module("c_proj", nn.Linear(mlp, w))
                    self.transformer.resblocks.append(blk)
                self.ln_final = nn.LayerNorm(w)
                self.text_projection = nn.Parameter(
                    0.02 * torch.randn(w, embed))

        torch.manual_seed(3)
        text = TextHalf(64, 32, 2, 2, 64, 77, 24)
        vision = ModifiedResNet(CFG)
        sd = {k: v for k, v in text.state_dict().items()}
        sd.update({"visual." + k: v for k, v in
                   vision.state_dict().items()})
        path = tmp_path / "rn50_tiny.pt"
        _t.save(sd, str(path))
        from marqo_tpu.models.tokenizer import TextTokenizer
        TextTokenizer.build_test_wordpiece()._tok.save(
            str(tmp_path / "tokenizer.json"))

        model = JaxResNetCLIPModel(
            "open_clip/RN50/openai",
            {"name": "open_clip/RN50/openai", "localpath": str(path),
             "dimensions": 24}, Device.CPU)
        # shrink the expected text config to the tiny mirror
        model._TEXT = {"RN50": (32, 2, 2, 64)}
        model.vision_config = CFG
        import marqo_tpu.models.resnet_clip as rc
        orig = rc.RESNET_CONFIGS
        rc.RESNET_CONFIGS = dict(orig, RN50=CFG)
        try:
            model.load()
        finally:
            rc.RESNET_CONFIGS = orig
        out = model.encode(["hello"], modality=Modality.TEXT)
        assert out.shape == (1, 24)
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 24)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
