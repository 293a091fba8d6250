"""ResNet-CLIP vision tower (openai RN50/RN101/RN50x4/x16/x64) in JAX.

The reference serves these via openai clip / open_clip (clip_utils.py:295;
registry entries RN50, RN101, RN50x4, RN50x16, RN50x64 + quickgelu
variants). The vision tower is the "ModifiedResNet": a 3-conv stem with
avg-pool downsampling, bottleneck stages whose stride-2 path is an avgpool
before the 1x1 conv (anti-aliased downsampling), and a 2D attention-pool
head whose single query is the mean of the spatial grid. The text tower is
the standard CLIP text transformer (models/clip.py).

Convolutions lower to XLA's conv ops (MXU-tiled on TPU); BatchNorm runs in
inference form (running statistics, fp32). Stages are heterogeneous so
blocks unroll at trace time (one compile per model, like torch)."""

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.models.clip import _model_put
from marqo_tpu.parallel.serving import put_params
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD


@dataclass(frozen=True)
class ResNetVisionConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)   # RN50
    width: int = 64
    image_size: int = 224
    output_dim: int = 1024
    heads: int = 32                          # attnpool heads = embed//64
    bn_eps: float = 1e-5


def _conv(x, w, dtype, stride=1, padding=0):
    """Conv in the compute dtype (bf16 on TPU → MXU); output in dtype."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, prefix, eps):
    """Inference BatchNorm in fp32 (statistics precision), fp32 out."""
    scale = (p[f"{prefix}_scale"] /
             jnp.sqrt(p[f"{prefix}_var"] + eps)).astype(jnp.float32)
    shift = (p[f"{prefix}_bias"] -
             p[f"{prefix}_mean"].astype(jnp.float32) * scale)
    return x.astype(jnp.float32) * scale + shift


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def _bottleneck(x, bp, stride: int, eps: float, dtype):
    out = jax.nn.relu(_bn(_conv(x, bp["conv1_w"], dtype), bp, "bn1", eps))
    out = jax.nn.relu(_bn(_conv(out, bp["conv2_w"], dtype, padding=1),
                          bp, "bn2", eps))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(_conv(out, bp["conv3_w"], dtype), bp, "bn3", eps)
    if "down_conv_w" in bp:
        identity = x
        if stride > 1:
            identity = _avgpool(identity.astype(jnp.float32), stride)
        identity = _bn(_conv(identity, bp["down_conv_w"], dtype), bp,
                       "down_bn", eps)
    else:
        identity = x.astype(jnp.float32)
    return jax.nn.relu(out + identity)


def encode_resnet_clip_image(params: dict, pixels_u8: jax.Array,
                             config: ResNetVisionConfig,
                             compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, output_dim) fp32 (unnormalized)."""
    p = params["vision"]
    x = pixels_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)

    stem = p["stem"]
    eps = config.bn_eps
    x = jax.nn.relu(_bn(_conv(x, stem["conv1_w"], compute_dtype, stride=2,
                              padding=1), stem, "bn1", eps))
    x = jax.nn.relu(_bn(_conv(x, stem["conv2_w"], compute_dtype, padding=1),
                        stem, "bn2", eps))
    x = jax.nn.relu(_bn(_conv(x, stem["conv3_w"], compute_dtype, padding=1),
                        stem, "bn3", eps))
    x = _avgpool(x, 2)

    for si, stage in enumerate(p["stages"]):
        for bi, bp in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _bottleneck(x, bp, stride, eps, compute_dtype)

    # AttentionPool2d: query = mean over the (1+HW) tokens' mean token
    ap = jax.tree.map(lambda a: a.astype(jnp.float32), p["attnpool"])
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C).astype(jnp.float32)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)       # (B, 1+HW, C)
    tokens = tokens + ap["pos"][None]
    q = tokens[:, :1] @ ap["q_w"] + ap["q_b"]
    k = tokens @ ap["k_w"] + ap["k_b"]
    v = tokens @ ap["v_w"] + ap["v_b"]
    nh = config.heads
    D = C // nh
    qh = q.reshape(B, 1, nh, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, -1, nh, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, -1, nh, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(D, jnp.float32))
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), vh)
    o = o.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return o @ ap["c_w"] + ap["c_b"]


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_resnet_clip_image_jit(params, pixels_u8, config,
                                 compute_dtype=jnp.bfloat16):
    return encode_resnet_clip_image(params, pixels_u8, config, compute_dtype)


# --- init + conversion -----------------------------------------------------------

def _conv_hwio(rng, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    return (jax.random.normal(rng, (kh, kw, cin, cout))
            / np.sqrt(fan_in)).astype(dtype)


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def init_resnet_clip_params(config: ResNetVisionConfig, rng,
                            dtype=jnp.float32) -> dict:
    """Random-init vision params (test mode); returns {"vision": ...}."""
    w = config.width
    keys = iter(jax.random.split(rng, 256))

    def bn(prefix, c, d):
        init = _bn_init(c, dtype)
        for k2, v in init.items():
            d[f"{prefix}_{k2}"] = v

    stem = {"conv1_w": _conv_hwio(next(keys), 3, 3, 3, w // 2, dtype),
            "conv2_w": _conv_hwio(next(keys), 3, 3, w // 2, w // 2, dtype),
            "conv3_w": _conv_hwio(next(keys), 3, 3, w // 2, w, dtype)}
    bn("bn1", w // 2, stem)
    bn("bn2", w // 2, stem)
    bn("bn3", w, stem)

    stages = []
    inplanes = w
    for si, n_blocks in enumerate(config.layers):
        planes = w * (2 ** si)
        stage = []
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            bp = {"conv1_w": _conv_hwio(next(keys), 1, 1, inplanes, planes,
                                        dtype),
                  "conv2_w": _conv_hwio(next(keys), 3, 3, planes, planes,
                                        dtype),
                  "conv3_w": _conv_hwio(next(keys), 1, 1, planes,
                                        planes * 4, dtype)}
            bn("bn1", planes, bp)
            bn("bn2", planes, bp)
            bn("bn3", planes * 4, bp)
            if stride > 1 or inplanes != planes * 4:
                bp["down_conv_w"] = _conv_hwio(next(keys), 1, 1, inplanes,
                                               planes * 4, dtype)
                bn("down_bn", planes * 4, bp)
            stage.append(bp)
            inplanes = planes * 4
        stages.append(stage)

    embed = w * 32
    spacial = config.image_size // 32
    ap = {"pos": (jax.random.normal(next(keys),
                                    (spacial * spacial + 1, embed))
                  / np.sqrt(embed)).astype(dtype),
          "q_w": _conv_hwio(next(keys), 1, 1, embed, embed,
                            dtype).reshape(embed, embed),
          "q_b": jnp.zeros((embed,), dtype),
          "k_w": _conv_hwio(next(keys), 1, 1, embed, embed,
                            dtype).reshape(embed, embed),
          "k_b": jnp.zeros((embed,), dtype),
          "v_w": _conv_hwio(next(keys), 1, 1, embed, embed,
                            dtype).reshape(embed, embed),
          "v_b": jnp.zeros((embed,), dtype),
          "c_w": _conv_hwio(next(keys), 1, 1, embed, config.output_dim,
                            dtype).reshape(embed, config.output_dim),
          "c_b": jnp.zeros((config.output_dim,), dtype)}
    return {"vision": {"stem": stem, "stages": stages, "attnpool": ap}}


def resnet_vision_params_from_torch(sd_np: dict,
                                    config: ResNetVisionConfig,
                                    prefix: str = "visual.",
                                    dtype=jnp.float32) -> dict:
    """Convert an openai/open_clip ModifiedResNet state dict (numpy values;
    keys visual.conv1..., visual.layer{1-4}.{i}..., visual.attnpool...)."""
    def cw(key):  # torch conv (O, I, kh, kw) → HWIO
        return jnp.asarray(sd_np[prefix + key].transpose(2, 3, 1, 0), dtype)

    def bn(dst, dprefix, key):
        dst[f"{dprefix}_scale"] = jnp.asarray(sd_np[prefix + key + ".weight"],
                                              dtype)
        dst[f"{dprefix}_bias"] = jnp.asarray(sd_np[prefix + key + ".bias"],
                                             dtype)
        dst[f"{dprefix}_mean"] = jnp.asarray(
            sd_np[prefix + key + ".running_mean"], dtype)
        dst[f"{dprefix}_var"] = jnp.asarray(
            sd_np[prefix + key + ".running_var"], dtype)

    stem = {"conv1_w": cw("conv1.weight"), "conv2_w": cw("conv2.weight"),
            "conv3_w": cw("conv3.weight")}
    bn(stem, "bn1", "bn1")
    bn(stem, "bn2", "bn2")
    bn(stem, "bn3", "bn3")

    stages = []
    for si, n_blocks in enumerate(config.layers):
        stage = []
        for bi in range(n_blocks):
            base = f"layer{si + 1}.{bi}"
            bp = {"conv1_w": cw(f"{base}.conv1.weight"),
                  "conv2_w": cw(f"{base}.conv2.weight"),
                  "conv3_w": cw(f"{base}.conv3.weight")}
            bn(bp, "bn1", f"{base}.bn1")
            bn(bp, "bn2", f"{base}.bn2")
            bn(bp, "bn3", f"{base}.bn3")
            if prefix + f"{base}.downsample.0.weight" in sd_np:
                bp["down_conv_w"] = cw(f"{base}.downsample.0.weight")
                bn(bp, "down_bn", f"{base}.downsample.1")
            stage.append(bp)
        stages.append(stage)

    ap = {"pos": jnp.asarray(sd_np[prefix + "attnpool.positional_embedding"],
                             dtype),
          "q_w": jnp.asarray(sd_np[prefix + "attnpool.q_proj.weight"].T,
                             dtype),
          "q_b": jnp.asarray(sd_np[prefix + "attnpool.q_proj.bias"], dtype),
          "k_w": jnp.asarray(sd_np[prefix + "attnpool.k_proj.weight"].T,
                             dtype),
          "k_b": jnp.asarray(sd_np[prefix + "attnpool.k_proj.bias"], dtype),
          "v_w": jnp.asarray(sd_np[prefix + "attnpool.v_proj.weight"].T,
                             dtype),
          "v_b": jnp.asarray(sd_np[prefix + "attnpool.v_proj.bias"], dtype),
          "c_w": jnp.asarray(sd_np[prefix + "attnpool.c_proj.weight"].T,
                             dtype),
          "c_b": jnp.asarray(sd_np[prefix + "attnpool.c_proj.bias"], dtype)}
    return {"vision": {"stem": stem, "stages": stages, "attnpool": ap}}


# registry arch name → config
RESNET_CONFIGS = {
    "RN50": ResNetVisionConfig((3, 4, 6, 3), 64, 224, 1024, 32),
    "RN101": ResNetVisionConfig((3, 4, 23, 3), 64, 224, 512, 32),
    "RN50x4": ResNetVisionConfig((4, 6, 10, 6), 80, 288, 640, 40),
    "RN50x16": ResNetVisionConfig((6, 8, 18, 8), 96, 384, 768, 48),
    "RN50x64": ResNetVisionConfig((3, 15, 36, 10), 128, 448, 1024, 64),
}


class JaxResNetCLIPModel:
    """RN-family CLIP wrapper: ModifiedResNet vision tower + the standard
    CLIP text transformer (reference clip_utils.py:295 serves these via
    openai clip; registry RN50/RN101/RN50x{4,16,64} incl. quickgelu)."""

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
        self.vision_config: ResNetVisionConfig = None
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
        for token in ("RN50x64", "RN50x16", "RN50x4", "RN101", "RN50"):
            if token in name:
                return token
        return "RN50"

    # text tower shapes paired with each RN vision tower (open_clip
    # model_configs/RN*.json)
    _TEXT = {
        "RN50": (512, 12, 8, 2048),
        "RN101": (512, 12, 8, 2048),
        "RN50x4": (640, 12, 10, 2560),
        "RN50x16": (768, 12, 12, 3072),
        "RN50x64": (1024, 12, 16, 4096),
    }

    def load(self) -> None:
        if self.properties.get("localpath"):
            self._load_from_checkpoint(self.properties["localpath"])
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            from marqo_tpu.core.exceptions import ModelLoadError
            raise ModelLoadError(
                f"ResNet-CLIP model `{self.model_name}` requires an "
                "openai/open_clip checkpoint: provide "
                "model_properties.localpath or a model_location.")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _text_config(self, embed_dim: int):
        from marqo_tpu.models.clip import CLIPTextConfig
        w, L, h, mlp = self._TEXT[self._arch_token()]
        # all RN-family pretrains are openai checkpoints → quick_gelu
        return CLIPTextConfig(hidden_size=w, num_layers=L, num_heads=h,
                              intermediate_size=mlp,
                              projection_dim=embed_dim,
                              hidden_act="quick_gelu")

    def _load_from_checkpoint(self, path: str) -> None:
        import os

        import torch
        token = self._arch_token()
        self.vision_config = RESNET_CONFIGS[token]
        self.text_config = self._text_config(self.vision_config.output_dim)
        if os.path.isdir(path):
            for fname in ("open_clip_pytorch_model.bin", "pytorch_model.bin",
                          "model.pt"):
                cand = os.path.join(path, fname)
                if os.path.isfile(cand):
                    path = cand
                    break
        from marqo_tpu.inference.checkpoint_load import load_torch_checkpoint
        state = load_torch_checkpoint(path, family="clip", weights_only=False)
        if hasattr(state, "state_dict"):  # jit-archived openai checkpoints
            state = state.state_dict()
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state = {k[len("module."):] if k.startswith("module.") else k: v
                 for k, v in state.items()}
        sd_np = {k: np.asarray(v.detach().cpu().numpy()
                               if hasattr(v, "detach") else v)
                 for k, v in state.items()}
        text = self._convert_text(sd_np)
        vision = resnet_vision_params_from_torch(
            sd_np, self.vision_config, dtype=self.compute_dtype)["vision"]
        self.params = put_params(self, {"text": text, "vision": vision})
        self._init_tokenizer(checkpoint=path)

    def _convert_text(self, sd_np: dict) -> dict:
        """openai/open_clip text half (token_embedding.weight,
        transformer.resblocks.*, ln_final, text_projection)."""
        dtype = self.compute_dtype
        L = self.text_config.num_layers

        def blocks(prefix):
            from marqo_tpu.models.clip import convert_open_clip_resblocks
            return convert_open_clip_resblocks(sd_np, prefix, L, dtype)

        return {
            "token_embedding": jnp.asarray(sd_np["token_embedding.weight"],
                                           dtype),
            "position_embedding": jnp.asarray(sd_np["positional_embedding"],
                                              dtype),
            "layers": blocks("transformer.resblocks"),
            "final_ln_scale": jnp.asarray(sd_np["ln_final.weight"], dtype),
            "final_ln_bias": jnp.asarray(sd_np["ln_final.bias"], dtype),
            "text_projection": jnp.asarray(sd_np["text_projection"], dtype),
        }

    def _load_random_init(self) -> None:
        import hashlib

        from marqo_tpu.models.clip import CLIPTextConfig, init_clip_params
        arch = self.properties.get("architecture", {})
        dims = int(self.properties.get("dimensions", 64))
        width = int(arch.get("width", 16))
        layers = tuple(arch.get("layers", (1, 1, 1, 1)))
        image_size = int(self.properties.get("image_size", 64))
        self.vision_config = ResNetVisionConfig(
            layers=layers, width=width, image_size=image_size,
            output_dim=dims, heads=int(arch.get("heads", 2)))
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
        from marqo_tpu.models.clip import CLIPVisionConfig
        text = init_clip_params(
            self.text_config,
            CLIPVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                             num_layers=1, num_heads=2,
                             intermediate_size=64, projection_dim=dims),
            rng, dtype=self.compute_dtype)["text"]
        vision = init_resnet_clip_params(
            self.vision_config, jax.random.fold_in(rng, 7),
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
            pixels, lambda padded: encode_resnet_clip_image_jit(
                self.params,
                _model_put(self, padded),
                self.vision_config, compute_dtype=self.compute_dtype))

    def memory_bytes(self) -> int:
        return self._param_bytes
