"""ConvNeXt-CLIP vision tower (open_clip convnext_base_w / large_d /
xxlarge families) in JAX.

The reference serves these open_clip checkpoints (registry entries
convnext_base, convnext_base_w{,_320}, convnext_large_d{,_320},
convnext_xxlarge) whose vision tower is a timm ConvNeXt trunk wrapped by
open_clip's TimmModel (global-avg pool + linear projection head). The text
tower is the standard CLIP text transformer.

ConvNeXt block: 7x7 depthwise conv → LayerNorm (channels-last) → pointwise
MLP (4x, GELU) → layer-scale gamma → residual. Stem is a 4x4/stride-4 conv
+ LN; stages downsample with LN + 2x2/stride-2 conv. Depthwise convs lower
to XLA grouped convs (feature_group_count=C).
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.ops.common import layer_norm
from marqo_tpu.models.clip import _model_put
from marqo_tpu.parallel.serving import put_params
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD


@dataclass(frozen=True)
class ConvNextVisionConfig:
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)   # convnext_base
    image_size: int = 256
    output_dim: int = 640
    layer_norm_eps: float = 1e-6


def _conv(x, w, b=None, stride=1, padding=0, groups=1):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if b is not None:
        out = out + b
    return out


def _block(x, bp, eps: float, dtype):
    """timm ConvNeXt block, channels-last throughout (native NHWC)."""
    C = x.shape[-1]
    h = _conv(x.astype(dtype), bp["dw_w"].astype(dtype),
              bp["dw_b"].astype(dtype), padding=3, groups=C)
    h = layer_norm(h.astype(jnp.float32), bp["norm_scale"], bp["norm_bias"],
                   eps).astype(dtype)
    h = jax.nn.gelu(
        jnp.einsum("bhwc,cd->bhwd", h, bp["mlp_w1"].astype(dtype))
        + bp["mlp_b1"].astype(dtype), approximate=False)
    h = jnp.einsum("bhwd,dc->bhwc", h, bp["mlp_w2"].astype(dtype)) \
        + bp["mlp_b2"].astype(dtype)
    return x + (bp["gamma"].astype(dtype) * h).astype(x.dtype)


def encode_convnext_clip_image(params: dict, pixels_u8: jax.Array,
                               config: ConvNextVisionConfig,
                               compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, output_dim) fp32 (unnormalized)."""
    p = params["vision"]
    eps = config.layer_norm_eps
    x = pixels_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

    stem = p["stem"]
    x = _conv(x.astype(compute_dtype), stem["conv_w"].astype(compute_dtype),
              stem["conv_b"].astype(compute_dtype), stride=4)
    x = layer_norm(x.astype(jnp.float32), stem["norm_scale"],
                   stem["norm_bias"], eps).astype(compute_dtype)

    for si, stage in enumerate(p["stages"]):
        if "down_conv_w" in stage:
            x = layer_norm(x.astype(jnp.float32), stage["down_norm_scale"],
                           stage["down_norm_bias"], eps).astype(compute_dtype)
            x = _conv(x, stage["down_conv_w"].astype(compute_dtype),
                      stage["down_conv_b"].astype(compute_dtype), stride=2)
        for bp in stage["blocks"]:
            x = _block(x, bp, eps, compute_dtype)

    # head: global average pool → LN → projection. open_clip TimmModel
    # timm_proj is 'linear' for convnext_base*, but 'mlp' (fc1-GELU-fc2)
    # for convnext_large_d*/xxlarge — the param layout selects the branch.
    pooled = x.astype(jnp.float32).mean(axis=(1, 2))
    head = p["head"]
    pooled = layer_norm(pooled, head["norm_scale"], head["norm_bias"], eps)
    if "mlp_w1" in head:
        h = jax.nn.gelu(pooled @ head["mlp_w1"].astype(jnp.float32)
                        + head["mlp_b1"].astype(jnp.float32),
                        approximate=False)
        return h @ head["mlp_w2"].astype(jnp.float32) + \
            head["mlp_b2"].astype(jnp.float32)
    return pooled @ head["proj_w"].astype(jnp.float32) + \
        head["proj_b"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_convnext_clip_image_jit(params, pixels_u8, config,
                                   compute_dtype=jnp.bfloat16):
    return encode_convnext_clip_image(params, pixels_u8, config,
                                      compute_dtype)


def init_convnext_params(config: ConvNextVisionConfig, rng,
                         dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 512))

    def w(shape):
        fan_in = int(np.prod(shape[:-1]))
        return (jax.random.normal(next(keys), shape)
                / np.sqrt(fan_in)).astype(dtype)

    dims = config.dims
    stem = {"conv_w": w((4, 4, 3, dims[0])),
            "conv_b": jnp.zeros((dims[0],), dtype),
            "norm_scale": jnp.ones((dims[0],), dtype),
            "norm_bias": jnp.zeros((dims[0],), dtype)}
    stages = []
    for si, depth in enumerate(config.depths):
        C = dims[si]
        stage = {"blocks": []}
        if si > 0:
            stage["down_norm_scale"] = jnp.ones((dims[si - 1],), dtype)
            stage["down_norm_bias"] = jnp.zeros((dims[si - 1],), dtype)
            stage["down_conv_w"] = w((2, 2, dims[si - 1], C))
            stage["down_conv_b"] = jnp.zeros((C,), dtype)
        for _ in range(depth):
            stage["blocks"].append({
                "dw_w": w((7, 7, 1, C)),
                "dw_b": jnp.zeros((C,), dtype),
                "norm_scale": jnp.ones((C,), dtype),
                "norm_bias": jnp.zeros((C,), dtype),
                "mlp_w1": w((C, 4 * C)),
                "mlp_b1": jnp.zeros((4 * C,), dtype),
                "mlp_w2": w((4 * C, C)),
                "mlp_b2": jnp.zeros((C,), dtype),
                "gamma": jnp.full((C,), 1e-6, dtype),
            })
        stages.append(stage)
    head = {"norm_scale": jnp.ones((dims[-1],), dtype),
            "norm_bias": jnp.zeros((dims[-1],), dtype),
            "proj_w": w((dims[-1], config.output_dim)),
            "proj_b": jnp.zeros((config.output_dim,), dtype)}
    return {"vision": {"stem": stem, "stages": stages, "head": head}}


def convnext_vision_params_from_torch(sd_np: dict,
                                      config: ConvNextVisionConfig,
                                      prefix: str = "visual.",
                                      dtype=jnp.float32) -> dict:
    """Convert an open_clip TimmModel(convnext) state dict: trunk.* timm
    naming (stem.0/1, stages.{s}.downsample.0/1, stages.{s}.blocks.{b}.
    conv_dw/norm/mlp.fc1/mlp.fc2/gamma, head.norm? under trunk) and
    head.proj open_clip naming."""
    t = prefix + "trunk."

    def cw(key):  # torch conv (O, I, kh, kw) → HWIO
        return jnp.asarray(sd_np[key].transpose(2, 3, 1, 0), dtype)

    stem = {"conv_w": cw(t + "stem.0.weight"),
            "conv_b": jnp.asarray(sd_np[t + "stem.0.bias"], dtype),
            "norm_scale": jnp.asarray(sd_np[t + "stem.1.weight"], dtype),
            "norm_bias": jnp.asarray(sd_np[t + "stem.1.bias"], dtype)}
    stages = []
    for si, depth in enumerate(config.depths):
        base = t + f"stages.{si}."
        stage = {"blocks": []}
        if si > 0:
            stage["down_norm_scale"] = jnp.asarray(
                sd_np[base + "downsample.0.weight"], dtype)
            stage["down_norm_bias"] = jnp.asarray(
                sd_np[base + "downsample.0.bias"], dtype)
            stage["down_conv_w"] = cw(base + "downsample.1.weight")
            stage["down_conv_b"] = jnp.asarray(
                sd_np[base + "downsample.1.bias"], dtype)
        for bi in range(depth):
            bb = base + f"blocks.{bi}."
            # timm depthwise conv weight is (C, 1, 7, 7) → HWIO (7,7,1,C)
            dw = sd_np[bb + "conv_dw.weight"].transpose(2, 3, 1, 0)
            stage["blocks"].append({
                "dw_w": jnp.asarray(dw, dtype),
                "dw_b": jnp.asarray(sd_np[bb + "conv_dw.bias"], dtype),
                "norm_scale": jnp.asarray(sd_np[bb + "norm.weight"], dtype),
                "norm_bias": jnp.asarray(sd_np[bb + "norm.bias"], dtype),
                "mlp_w1": jnp.asarray(sd_np[bb + "mlp.fc1.weight"].T, dtype),
                "mlp_b1": jnp.asarray(sd_np[bb + "mlp.fc1.bias"], dtype),
                "mlp_w2": jnp.asarray(sd_np[bb + "mlp.fc2.weight"].T, dtype),
                "mlp_b2": jnp.asarray(sd_np[bb + "mlp.fc2.bias"], dtype),
                "gamma": jnp.asarray(sd_np[bb + "gamma"], dtype),
            })
        stages.append(stage)
    # timm puts the final norm in head.norm when global_pool precedes it
    nk = t + ("head.norm.weight" if t + "head.norm.weight" in sd_np
              else "norm_pre.weight")
    head = {"norm_scale": jnp.asarray(sd_np[nk], dtype),
            "norm_bias": jnp.asarray(sd_np[nk.replace(".weight", ".bias")],
                                     dtype)}
    if prefix + "head.mlp.fc1.weight" in sd_np:
        # open_clip timm_proj='mlp' (convnext_large_d*/xxlarge configs)
        head["mlp_w1"] = jnp.asarray(
            sd_np[prefix + "head.mlp.fc1.weight"].T, dtype)
        head["mlp_b1"] = jnp.asarray(
            sd_np[prefix + "head.mlp.fc1.bias"], dtype)
        head["mlp_w2"] = jnp.asarray(
            sd_np[prefix + "head.mlp.fc2.weight"].T, dtype)
        head["mlp_b2"] = jnp.asarray(
            sd_np[prefix + "head.mlp.fc2.bias"], dtype)
    else:
        head["proj_w"] = jnp.asarray(
            sd_np[prefix + "head.proj.weight"].T, dtype)
        head["proj_b"] = jnp.asarray(
            sd_np[prefix + "head.proj.bias"], dtype)
    return {"vision": {"stem": stem, "stages": stages, "head": head}}


CONVNEXT_CONFIGS = {
    "convnext_base_w_320": ConvNextVisionConfig(
        (3, 3, 27, 3), (128, 256, 512, 1024), 320, 640),
    "convnext_base_w": ConvNextVisionConfig(
        (3, 3, 27, 3), (128, 256, 512, 1024), 256, 640),
    "convnext_base": ConvNextVisionConfig(
        (3, 3, 27, 3), (128, 256, 512, 1024), 224, 512),
    "convnext_large_d_320": ConvNextVisionConfig(
        (3, 3, 27, 3), (192, 384, 768, 1536), 320, 768),
    "convnext_large_d": ConvNextVisionConfig(
        (3, 3, 27, 3), (192, 384, 768, 1536), 256, 768),
    "convnext_xxlarge": ConvNextVisionConfig(
        (3, 4, 30, 3), (384, 768, 1536, 3072), 256, 1024),
}

# text tower shapes per family (open_clip model_configs/convnext_*.json)
CONVNEXT_TEXT = {
    "convnext_base": (512, 12, 8, 2048),
    "convnext_base_w": (640, 12, 10, 2560),
    "convnext_base_w_320": (640, 12, 10, 2560),
    "convnext_large_d": (768, 16, 12, 3072),
    "convnext_large_d_320": (768, 16, 12, 3072),
    "convnext_xxlarge": (1024, 24, 16, 4096),
}


class JaxConvNextCLIPModel:
    """ConvNeXt-CLIP wrapper: timm ConvNeXt vision trunk + CLIP text
    transformer (reference serves via open_clip TimmModel)."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device,
                 model_auth=None):
        from marqo_tpu.inference.types import Device
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.params = None
        self.text_config = None
        self.vision_config = None
        self.tokenizer = None
        self._param_bytes = 0
        platform = "cpu" if device == Device.CPU else None
        try:
            self._jdevice = (jax.devices(platform)[0] if platform
                             else jax.devices()[0])
        except RuntimeError:
            self._jdevice = jax.devices()[0]

    @property
    def dimensions(self) -> int:
        return int(self.properties.get("dimensions", 0)) or \
            (self.vision_config.output_dim if self.vision_config else 0)

    def _arch_token(self) -> str:
        name = self.properties.get("name", self.model_name)
        for token in sorted(CONVNEXT_CONFIGS, key=len, reverse=True):
            if token in name:
                return token
        return "convnext_base"

    def load(self) -> None:
        if self.properties.get("localpath"):
            self._load_from_checkpoint(self.properties["localpath"])
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            from marqo_tpu.core.exceptions import ModelLoadError
            raise ModelLoadError(
                f"ConvNeXt-CLIP model `{self.model_name}` requires an "
                "open_clip checkpoint: provide model_properties.localpath "
                "or a model_location.")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_checkpoint(self, path: str) -> None:
        import os

        import torch

        from marqo_tpu.models.clip import CLIPTextConfig
        from marqo_tpu.models.resnet_clip import JaxResNetCLIPModel
        token = self._arch_token()
        self.vision_config = CONVNEXT_CONFIGS[token]
        w, L, h, mlp = CONVNEXT_TEXT[token]
        self.text_config = CLIPTextConfig(
            hidden_size=w, num_layers=L, num_heads=h, intermediate_size=mlp,
            projection_dim=self.vision_config.output_dim, hidden_act="gelu")
        if os.path.isdir(path):
            for fname in ("open_clip_pytorch_model.bin", "pytorch_model.bin",
                          "model.pt"):
                cand = os.path.join(path, fname)
                if os.path.isfile(cand):
                    path = cand
                    break
        from marqo_tpu.inference.checkpoint_load import load_torch_checkpoint
        state = load_torch_checkpoint(path, family="open_clip")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state = {k[len("module."):] if k.startswith("module.") else k: v
                 for k, v in state.items()}
        sd_np = {k: np.asarray(v.detach().cpu().numpy()
                               if hasattr(v, "detach") else v)
                 for k, v in state.items()}
        text = JaxResNetCLIPModel._convert_text(self, sd_np)
        vision = convnext_vision_params_from_torch(
            sd_np, self.vision_config, dtype=self.compute_dtype)["vision"]
        self.params = put_params(self, {"text": text, "vision": vision})
        self._init_tokenizer(checkpoint=path)

    def _load_random_init(self) -> None:
        import hashlib

        from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                           init_clip_params)
        arch = self.properties.get("architecture", {})
        dims = int(self.properties.get("dimensions", 24))
        self.vision_config = ConvNextVisionConfig(
            depths=tuple(arch.get("depths", (1, 1, 1, 1))),
            dims=tuple(arch.get("dims", (8, 16, 32, 64))),
            image_size=int(self.properties.get("image_size", 64)),
            output_dim=dims)
        self.text_config = CLIPTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=int(arch.get("text_hidden_size", 64)),
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 128)),
            projection_dim=dims,
            eos_token_id=int(arch.get("vocab_size", 1024)) - 1)
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        rng = jax.random.PRNGKey(seed)
        text = init_clip_params(
            self.text_config,
            CLIPVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                             num_layers=1, num_heads=2,
                             intermediate_size=64, projection_dim=dims),
            rng, dtype=self.compute_dtype)["text"]
        vision = init_convnext_params(
            self.vision_config, jax.random.fold_in(rng, 9),
            dtype=self.compute_dtype)["vision"]
        self.params = put_params(self, {"text": text, "vision": vision})
        self._init_tokenizer()

    def _init_tokenizer(self, checkpoint: str = None) -> None:
        from marqo_tpu.models.tokenizer import resolve_model_tokenizer
        self.tokenizer = resolve_model_tokenizer(
            self.properties, max_length=self.text_config.max_positions,
            checkpoint_path=checkpoint,
            allow_test=bool(self.properties.get("random_init")))

    # -- encoding ------------------------------------------------------------

    def encode(self, contents, normalize: bool = True, modality=None):
        from marqo_tpu.core.exceptions import VectoriseError
        from marqo_tpu.inference.types import Modality
        if modality is None:
            modality = Modality.TEXT
        if modality == Modality.TEXT:
            out = self._encode_text([str(c) for c in contents])
        elif modality == Modality.IMAGE:
            out = self._encode_images(contents)
        else:
            raise VectoriseError(
                f"Model `{self.model_name}` does not support modality "
                f"{modality.value}")
        if normalize:
            out = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out.astype(np.float32)

    def _encode_text(self, texts):
        from marqo_tpu.models.clip import JaxCLIPModel
        return JaxCLIPModel._encode_text(self, texts)

    def _tokenize(self, texts):
        from marqo_tpu.models.clip import JaxCLIPModel
        return JaxCLIPModel._tokenize(self, texts)

    def _encode_images(self, contents) -> np.ndarray:
        from marqo_tpu.inference.batching import batched_device_encode
        from marqo_tpu.models.clip import JaxCLIPModel
        pixels = np.stack([
            JaxCLIPModel._preprocess_host(self, c) for c in contents])
        return batched_device_encode(
            pixels, lambda padded: encode_convnext_clip_image_jit(
                self.params,
                _model_put(self, padded),
                self.vision_config, compute_dtype=self.compute_dtype))

    def memory_bytes(self) -> int:
        return self._param_bytes
