"""ConvNeXt-CLIP vision parity vs a torch mirror of timm/open_clip
semantics (depthwise 7x7 + channels-last LN + pointwise MLP + layer scale;
stem and downsample convs; avg-pool + LN + linear head), with state-dict
keys matching open_clip TimmModel naming. fp32, 1e-4."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from marqo_tpu.models.convnext_clip import (ConvNextVisionConfig,
                                            convnext_vision_params_from_torch,
                                            encode_convnext_clip_image)
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

CFG = ConvNextVisionConfig(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64),
                           image_size=64, output_dim=24)
EPS = 1e-6


class Block(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=EPS)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-2 * torch.randn(dim))

    def forward(self, x):  # NCHW
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp.fc2(F.gelu(self.mlp.fc1(x)))
        x = self.gamma * x
        return shortcut + x.permute(0, 3, 1, 2)


class LayerNorm2d(nn.LayerNorm):
    def forward(self, x):  # NCHW
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class Trunk(nn.Module):
    def __init__(self, cfg: ConvNextVisionConfig):
        super().__init__()
        dims = cfg.dims
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            LayerNorm2d(dims[0], eps=EPS))
        self.stages = nn.ModuleList()
        for si, depth in enumerate(cfg.depths):
            stage = nn.Module()
            if si > 0:
                stage.downsample = nn.Sequential(
                    LayerNorm2d(dims[si - 1], eps=EPS),
                    nn.Conv2d(dims[si - 1], dims[si], 2, stride=2))
            stage.blocks = nn.ModuleList(
                [Block(dims[si]) for _ in range(depth)])
            self.stages.append(stage)
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(dims[-1], eps=EPS)

    def forward(self, x):
        x = self.stem(x)
        for si, stage in enumerate(self.stages):
            if si > 0:
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
        pooled = x.mean(dim=(2, 3))
        return self.head.norm(pooled)


class VisualMirror(nn.Module):
    """open_clip TimmModel: trunk + head (linear proj, or fc1-GELU-fc2 MLP
    as in the convnext_large_d*/xxlarge configs)."""

    def __init__(self, cfg, proj="linear"):
        super().__init__()
        self.trunk = Trunk(cfg)
        self.head = nn.Module()
        self.proj_kind = proj
        if proj == "mlp":
            self.head.mlp = nn.Module()
            self.head.mlp.fc1 = nn.Linear(cfg.dims[-1], 2 * cfg.output_dim)
            self.head.mlp.fc2 = nn.Linear(2 * cfg.output_dim,
                                          cfg.output_dim)
        else:
            self.head.proj = nn.Linear(cfg.dims[-1], cfg.output_dim)

    def forward(self, x):
        h = self.trunk(x)
        if self.proj_kind == "mlp":
            return self.head.mlp.fc2(F.gelu(self.head.mlp.fc1(h)))
        return self.head.proj(h)


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(31)
    mirror = VisualMirror(CFG).eval()
    sd_np = {"visual." + k: v.numpy() for k, v in
             mirror.state_dict().items()}
    params = convnext_vision_params_from_torch(sd_np, CFG,
                                               dtype=jnp.float32)
    return mirror, params


class TestConvNextParity:
    def test_vision_tower(self, mirror_and_params):
        mirror, params = mirror_and_params
        rng = np.random.default_rng(9)
        u8 = rng.integers(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        with torch.no_grad():
            ref = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)).float())
        out = encode_convnext_clip_image(params, jnp.asarray(u8), CFG,
                                         compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestConvNextMlpHeadParity:
    def test_mlp_head(self):
        """convnext_large_d*/xxlarge use timm_proj='mlp'."""
        torch.manual_seed(32)
        mirror = VisualMirror(CFG, proj="mlp").eval()
        sd_np = {"visual." + k: v.numpy() for k, v in
                 mirror.state_dict().items()}
        params = convnext_vision_params_from_torch(sd_np, CFG,
                                                   dtype=jnp.float32)
        rng = np.random.default_rng(10)
        u8 = rng.integers(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
        x = u8.astype(np.float32) / 255.0
        x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        with torch.no_grad():
            ref = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)).float())
        out = encode_convnext_clip_image(params, jnp.asarray(u8), CFG,
                                         compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   atol=1e-4, rtol=1e-4)


class TestConvNextWrapper:
    def test_random_init_encode_and_dispatch(self):
        from marqo_tpu.inference.loaders import load_model
        from marqo_tpu.inference.model_registry import (
            get_model_properties_from_registry)
        from marqo_tpu.inference.types import Device, Modality
        from marqo_tpu.models.convnext_clip import JaxConvNextCLIPModel
        props = dict(get_model_properties_from_registry(
            "open_clip/convnext_base_w/laion2b_s13b_b82k"))
        props.update({"random_init": True, "dimensions": 24,
                      "image_size": 64,
                      "architecture": {"vocab_size": 64}})
        model = load_model("open_clip/convnext_base_w/laion2b_s13b_b82k",
                           props, Device.CPU)
        assert isinstance(model, JaxConvNextCLIPModel)
        out = model.encode(["a cat"], modality=Modality.TEXT)
        assert out.shape == (1, 24)
        img = np.zeros((64, 80, 3), dtype=np.uint8)
        out = model.encode([img], modality=Modality.IMAGE)
        assert out.shape == (1, 24)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-5)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
