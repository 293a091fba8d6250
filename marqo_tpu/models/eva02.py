"""EVA02-CLIP: RoPE + SwiGLU vision trunk with a standard CLIP text tower.

Parity target: the reference serves EVA02 checkpoints through open_clip's
timm trunk (model_registry.py open_clip section: EVA02-B-16 /
EVA02-L-14 / EVA02-L-14-336). The architecture follows the EVA-02 paper
(arXiv:2303.11331) + the timm ``eva.py`` block layout:

  - patch embed (stride == patch ⇒ matmul over unfolded patches), class
    token, learned absolute position embeddings;
  - per-layer 2D axial rotary embeddings applied to q/k of every patch
    token (class token NOT rotated), GPT-NeoX-style interleaved rotation
    with axial y/x frequency bands (timm RotaryEmbeddingCat semantics);
  - attention with q/v biases but NO k bias (EVA's asymmetric-bias MHA);
  - SwiGLU FFN with an inner LayerNorm before the down-projection
    (timm ``SwiGLU``: fc2(norm(silu(fc1_g(x)) * fc1_x(x))));
  - final LayerNorm, class-token pooling, linear projection.

OFFLINE-VERIFICATION STATUS: the block math is torch-mirror parity-tested
(tests/test_eva02_parity.py), but neither timm nor open_clip is installed
in this environment, so the CHECKPOINT KEY MAPPING cannot be verified
against a real EVA02 state dict. Loading real weights therefore requires
MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE and logs a warning naming exactly
what is unverified (VERDICT r3 item 7).
"""

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.parallel.serving import put_params

from marqo_tpu.core.exceptions import ModelLoadError, VectoriseError
from marqo_tpu.inference.batching import pick_batch_bucket
from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.logging import get_logger
from marqo_tpu.models.clip import (CLIPTextConfig, encode_clip_text,
                                   _model_put)
from marqo_tpu.ops.common import layer_norm
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

logger = get_logger(__name__)


@dataclass(frozen=True)
class EVA02VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    swiglu_hidden: int = 2730  # EVA02 mlp_ratio 4*2/3
    embed_dim: int = 768
    layer_norm_eps: float = 1e-6
    rope_temperature: float = 100.0


# open_clip model configs for the registry names (width, layers, heads,
# patch, swiglu hidden, embed) + text tower (width, layers, heads, mlp)
EVA02_ARCHS = {
    "EVA02-B-16": ((768, 12, 12, 16, 2048, 512), (512, 12, 8, 2048)),
    "EVA02-L-14-336": ((1024, 24, 16, 14, 2730, 768), (768, 12, 12, 3072)),
    "EVA02-L-14": ((1024, 24, 16, 14, 2730, 768), (768, 12, 12, 3072)),
}


def rope_2d_freqs(grid_side: int, head_dim: int,
                  temperature: float = 100.0) -> np.ndarray:
    """Axial 2D rotary sin/cos table for a (grid, grid) patch grid.

    Returns (grid², head_dim * 2): [sin | cos], each half laid out as
    interleaved axial bands [y-bands repeated 2x, x-bands repeated 2x]
    (timm RotaryEmbeddingCat with in_pixels=False)."""
    num_bands = head_dim // 4
    exponent = np.arange(num_bands, dtype=np.float64) / num_bands
    inv_freq = 1.0 / (temperature ** exponent)
    t = np.arange(grid_side, dtype=np.float64)
    per_axis = np.outer(t, inv_freq)                      # (S, bands)
    ys = np.repeat(per_axis[:, None, :], grid_side, 1)    # (S, S, bands) y
    xs = np.repeat(per_axis[None, :, :], grid_side, 0)    # (S, S, bands) x
    freqs = np.concatenate([ys, xs], axis=-1).reshape(grid_side ** 2,
                                                      head_dim // 2)
    freqs = np.repeat(freqs, 2, axis=-1)                  # interleave pairs
    return np.concatenate([np.sin(freqs), np.cos(freqs)],
                          axis=-1).astype(np.float32)


def _rot(x):
    """GPT-NeoX interleaved rotation: (-x1, x0, -x3, x2, ...)."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    return jnp.stack([-x1, x0], axis=-1).reshape(x.shape)


def _apply_rope(x, sin, cos):
    """x: (B, N, S, D); sin/cos: (S, D)."""
    return x * cos + _rot(x) * sin


def _eva_block(x, lp, rope_sin, rope_cos, num_heads: int, eps: float):
    """One EVA02 block. x: (B, S, H) with x[:, 0] = class token."""
    B, S, H = x.shape
    D = H // num_heads
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
    q = jnp.einsum("bsh,hd->bsd", h, lp["q_w"]) + lp["q_b"]
    k = jnp.einsum("bsh,hd->bsd", h, lp["k_w"])  # EVA: no k bias
    v = jnp.einsum("bsh,hd->bsd", h, lp["v_w"]) + lp["v_b"]
    qh = q.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    # rotate patch tokens only; the class token keeps identity
    qh = jnp.concatenate(
        [qh[:, :, :1], _apply_rope(qh[:, :, 1:], rope_sin, rope_cos)], axis=2)
    kh = jnp.concatenate(
        [kh[:, :, :1], _apply_rope(kh[:, :, 1:], rope_sin, rope_cos)], axis=2)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(D, jnp.float32))
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    a = a.transpose(0, 2, 1, 3).reshape(B, S, H)
    x = x + (jnp.einsum("bsh,hd->bsd", a, lp["o_w"]) + lp["o_b"])

    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    gate = jax.nn.silu(jnp.einsum("bsh,hi->bsi", h, lp["w1_gate"])
                       + lp["b1_gate"])
    val = jnp.einsum("bsh,hi->bsi", h, lp["w1_val"]) + lp["b1_val"]
    inner = layer_norm(gate * val, lp["ffn_ln_scale"], lp["ffn_ln_bias"],
                       eps)
    return x + (jnp.einsum("bsi,ih->bsh", inner, lp["w2"]) + lp["b2"])


def encode_eva02_image(params: dict, pixels_u8: jax.Array,
                       config: EVA02VisionConfig,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, embed_dim) fp32 (unnormalized)."""
    p = params["vision"]
    B = pixels_u8.shape[0]
    size, patch = config.image_size, config.patch_size
    n_side = size // patch
    x = pixels_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    x = x.reshape(B, n_side, patch, n_side, patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n_side * n_side,
                                              patch * patch * 3)
    x = x.astype(compute_dtype)
    x = jnp.einsum("bnp,ph->bnh", x,
                   p["patch_embedding"].astype(compute_dtype))
    x = x + p["patch_bias"].astype(compute_dtype)
    cls = jnp.broadcast_to(p["class_embedding"].astype(compute_dtype),
                           (B, 1, config.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(compute_dtype)[None]

    table = p["rope_table"]  # (grid², head_dim*2) fp32, [sin | cos]
    head_dim = config.hidden_size // config.num_heads
    rope_sin = table[:, :head_dim].astype(compute_dtype)
    rope_cos = table[:, head_dim:].astype(compute_dtype)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])

    def body(carry, lp):
        return _eva_block(carry, lp, rope_sin, rope_cos, config.num_heads,
                          config.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, layers)
    x = layer_norm(x.astype(jnp.float32), p["final_ln_scale"],
                   p["final_ln_bias"], config.layer_norm_eps)
    pooled = x[:, 0, :]  # class-token pooling (timm global_pool='token')
    return pooled @ p["head_w"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_eva02_image_jit(params, pixels_u8, config,
                           compute_dtype=jnp.bfloat16):
    return encode_eva02_image(params, pixels_u8, config, compute_dtype)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_eva02_text_jit(params, input_ids, config,
                          compute_dtype=jnp.bfloat16):
    return encode_clip_text(params, input_ids, config, compute_dtype)


# --- init / conversion -------------------------------------------------------

def init_eva02_vision_params(config: EVA02VisionConfig, rng,
                             dtype=jnp.float32) -> dict:
    H, I, L = config.hidden_size, config.swiglu_hidden, config.num_layers
    D = H // config.num_heads
    n_patches = (config.image_size // config.patch_size) ** 2
    keys = iter(jax.random.split(rng, 12))
    std = 0.02

    def norm(shape):
        return (jax.random.normal(next(keys), shape) * std).astype(dtype)

    def stack(shape):
        return (jax.random.normal(next(keys), (L,) + shape) * std
                ).astype(dtype)

    layers = {
        "q_w": stack((H, H)), "q_b": jnp.zeros((L, H), dtype),
        "k_w": stack((H, H)),
        "v_w": stack((H, H)), "v_b": jnp.zeros((L, H), dtype),
        "o_w": stack((H, H)), "o_b": jnp.zeros((L, H), dtype),
        "ln1_scale": jnp.ones((L, H), dtype),
        "ln1_bias": jnp.zeros((L, H), dtype),
        "ln2_scale": jnp.ones((L, H), dtype),
        "ln2_bias": jnp.zeros((L, H), dtype),
        "w1_gate": stack((H, I)), "b1_gate": jnp.zeros((L, I), dtype),
        "w1_val": stack((H, I)), "b1_val": jnp.zeros((L, I), dtype),
        "ffn_ln_scale": jnp.ones((L, I), dtype),
        "ffn_ln_bias": jnp.zeros((L, I), dtype),
        "w2": stack((I, H)), "b2": jnp.zeros((L, H), dtype),
    }
    return {
        "patch_embedding": norm(
            (config.patch_size * config.patch_size * 3, H)),
        "patch_bias": jnp.zeros((H,), dtype),
        "class_embedding": norm((H,)),
        "position_embedding": norm((n_patches + 1, H)),
        "rope_table": jnp.asarray(rope_2d_freqs(
            config.image_size // config.patch_size, D,
            config.rope_temperature)),
        "layers": layers,
        "final_ln_scale": jnp.ones((H,), dtype),
        "final_ln_bias": jnp.zeros((H,), dtype),
        "head_w": norm((H, config.embed_dim)),
    }


def params_from_open_clip_eva02(state_dict, text_config: CLIPTextConfig,
                                vision_config: EVA02VisionConfig,
                                dtype=jnp.bfloat16) -> dict:
    """Convert an open_clip EVA02 state dict (timm trunk under
    ``visual.trunk.*``) to our pytree.

    UNVERIFIED MAPPING: timm/open_clip are not installed here, so the key
    names below follow timm eva.py's published layout but cannot be
    diff-tested against a real checkpoint offline. Guarded by
    MARQO_ALLOW_UNVERIFIED_CONVERSION at the caller.
    """
    import torch

    def t2j(tensor, transpose=False):
        arr = tensor.detach().to(torch.float32).numpy()
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, dtype)

    def get(*names):
        for name in names:
            if name in state_dict:
                return state_dict[name]
        raise ModelLoadError(
            f"EVA02 conversion: none of {names} found in checkpoint "
            f"(unverified mapping — see models/eva02.py)")

    V = "visual.trunk."
    L = vision_config.num_layers
    H = vision_config.hidden_size

    def stacked(fmt, transpose=False, optional_zero=None):
        mats = []
        for i in range(L):
            key = fmt.format(i=i)
            if key not in state_dict and optional_zero is not None:
                mats.append(jnp.zeros(optional_zero, dtype))
                continue
            mats.append(t2j(state_dict[key], transpose))
        return jnp.stack(mats)

    # timm SwiGLU: fc1_g / fc1_x / norm / fc2
    layers = {
        "q_w": stacked(V + "blocks.{i}.attn.q_proj.weight", transpose=True),
        "q_b": stacked(V + "blocks.{i}.attn.q_bias", optional_zero=(H,)),
        "k_w": stacked(V + "blocks.{i}.attn.k_proj.weight", transpose=True),
        "v_w": stacked(V + "blocks.{i}.attn.v_proj.weight", transpose=True),
        "v_b": stacked(V + "blocks.{i}.attn.v_bias", optional_zero=(H,)),
        "o_w": stacked(V + "blocks.{i}.attn.proj.weight", transpose=True),
        "o_b": stacked(V + "blocks.{i}.attn.proj.bias"),
        "ln1_scale": stacked(V + "blocks.{i}.norm1.weight"),
        "ln1_bias": stacked(V + "blocks.{i}.norm1.bias"),
        "ln2_scale": stacked(V + "blocks.{i}.norm2.weight"),
        "ln2_bias": stacked(V + "blocks.{i}.norm2.bias"),
        "w1_gate": stacked(V + "blocks.{i}.mlp.fc1_g.weight", transpose=True),
        "b1_gate": stacked(V + "blocks.{i}.mlp.fc1_g.bias"),
        "w1_val": stacked(V + "blocks.{i}.mlp.fc1_x.weight", transpose=True),
        "b1_val": stacked(V + "blocks.{i}.mlp.fc1_x.bias"),
        "ffn_ln_scale": stacked(V + "blocks.{i}.mlp.norm.weight"),
        "ffn_ln_bias": stacked(V + "blocks.{i}.mlp.norm.bias"),
        "w2": stacked(V + "blocks.{i}.mlp.fc2.weight", transpose=True),
        "b2": stacked(V + "blocks.{i}.mlp.fc2.bias"),
    }
    patch_w = get(V + "patch_embed.proj.weight")  # (H, 3, p, p)
    patch = vision_config.patch_size
    patch_w = patch_w.detach().to(torch.float32).numpy()
    # conv (H, 3, p, p) → matmul over unfolded (p, p, 3) patches
    patch_w = patch_w.transpose(2, 3, 1, 0).reshape(patch * patch * 3, H)
    D = H // vision_config.num_heads
    vision = {
        "patch_embedding": jnp.asarray(patch_w, dtype),
        "patch_bias": t2j(get(V + "patch_embed.proj.bias")),
        "class_embedding": t2j(get(V + "cls_token")).reshape(H),
        "position_embedding": t2j(get(V + "pos_embed")).reshape(-1, H),
        "rope_table": jnp.asarray(rope_2d_freqs(
            vision_config.image_size // patch, D,
            vision_config.rope_temperature)),
        "layers": layers,
        "final_ln_scale": t2j(get(V + "norm.weight", V + "fc_norm.weight")),
        "final_ln_bias": t2j(get(V + "norm.bias", V + "fc_norm.bias")),
        "head_w": t2j(get(V + "head.weight", "visual.head.proj.weight"),
                      transpose=True),
    }

    # text tower: standard open_clip CLIP text transformer
    from marqo_tpu.models.clip import convert_open_clip_resblocks
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    text_prefix = ("text.transformer.resblocks"
                   if "text.transformer.resblocks.0.attn.in_proj_weight"
                   in sd else "transformer.resblocks")
    tp = "text." if text_prefix.startswith("text.") else ""
    text = {
        "token_embedding": jnp.asarray(sd[tp + "token_embedding.weight"],
                                       dtype),
        "position_embedding": jnp.asarray(sd[tp + "positional_embedding"],
                                          dtype),
        "layers": convert_open_clip_resblocks(sd, text_prefix,
                                              text_config.num_layers, dtype),
        "final_ln_scale": jnp.asarray(sd[tp + "ln_final.weight"], dtype),
        "final_ln_bias": jnp.asarray(sd[tp + "ln_final.bias"], dtype),
        "text_projection": jnp.asarray(sd[tp + "text_projection"], dtype),
    }
    return {"vision": vision, "text": text}


def init_eva02_params(text_config: CLIPTextConfig,
                      vision_config: EVA02VisionConfig, rng,
                      dtype=jnp.float32) -> dict:
    # reuse the CLIP text init by building a full clip pytree and taking
    # its text half (init_clip_params needs a vision config; give a tiny
    # one — its vision half is discarded)
    from marqo_tpu.models.clip import CLIPVisionConfig, init_clip_params
    r1, r2 = jax.random.split(rng)
    tiny_vision = CLIPVisionConfig(image_size=32, patch_size=16,
                                   hidden_size=32, num_layers=1,
                                   num_heads=2, intermediate_size=64,
                                   projection_dim=text_config.projection_dim)
    text = init_clip_params(text_config, tiny_vision, r1,
                            dtype=dtype)["text"]
    return {"text": text,
            "vision": init_eva02_vision_params(vision_config, r2, dtype)}


class JaxEVA02Model:
    """EVA02-CLIP wrapper (text + image embedding).

    Real-checkpoint loading requires MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE
    (the timm key mapping is not offline-verifiable — see module docstring).
    """

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth=None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.params = None
        self.text_config: Optional[CLIPTextConfig] = None
        self.vision_config: Optional[EVA02VisionConfig] = None
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
            (self.vision_config.embed_dim if self.vision_config else 0)

    def _configs_for_name(self):
        name = self.properties.get("name", self.model_name)
        for token, (vis, txt) in EVA02_ARCHS.items():
            if token in name:
                w, L, h, patch, swiglu, embed = vis
                tw, tL, th, tmlp = txt
                image = 336 if "336" in token else int(
                    self.properties.get("image_size", 224))
                return (CLIPTextConfig(hidden_size=tw, num_layers=tL,
                                       num_heads=th, intermediate_size=tmlp,
                                       projection_dim=embed,
                                       hidden_act="gelu"),
                        EVA02VisionConfig(image_size=image, patch_size=patch,
                                          hidden_size=w, num_layers=L,
                                          num_heads=h, swiglu_hidden=swiglu,
                                          embed_dim=embed))
        return (CLIPTextConfig(projection_dim=512, hidden_act="gelu"),
                EVA02VisionConfig(embed_dim=512))

    def load(self) -> None:
        if self.properties.get("localpath") or \
                self.properties.get("model_location"):
            from marqo_tpu.api import configs
            allow = str(configs.read_env_vars_and_defaults(
                "MARQO_ALLOW_UNVERIFIED_CONVERSION") or "").upper() == "TRUE"
            if not allow:
                raise ModelLoadError(
                    f"EVA02 model `{self.model_name}`: the timm checkpoint "
                    "key mapping cannot be verified offline (timm/open_clip "
                    "not installed). Set "
                    "MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE to load anyway "
                    "(block math is parity-tested; the KEY MAPPING is the "
                    "unverified part), or use a ViT/SigLIP CLIP model.")
            logger.warning(
                f"Loading EVA02 model `{self.model_name}` with UNVERIFIED "
                "checkpoint conversion: timm key layout and RoPE band "
                "convention assumed from published sources, not diff-tested "
                "against timm (MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE).")
            self._load_from_checkpoint()
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            raise ModelLoadError(
                f"EVA02 model `{self.model_name}` requires an open_clip "
                "checkpoint: provide model_properties.localpath or a "
                "model_location (and MARQO_ALLOW_UNVERIFIED_CONVERSION).")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_checkpoint(self) -> None:
        import os

        import torch
        path = self.properties.get("localpath")
        if not path and self.properties.get("model_location"):
            from marqo_tpu.inference.model_download import (
                auth_for_location, download_model)
            loc = self.properties["model_location"]
            path = download_model(
                repo_location=loc,
                auth=auth_for_location(loc, self.model_auth))
        self.text_config, self.vision_config = self._configs_for_name()
        if os.path.isdir(path):
            for fname in ("open_clip_pytorch_model.bin",
                          "pytorch_model.bin", "model.pt"):
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
        self.params = put_params(self, 
            params_from_open_clip_eva02(state, self.text_config,
                                        self.vision_config,
                                        dtype=self.compute_dtype))
        self._init_tokenizer()

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        embed = int(self.properties.get("dimensions", 64))
        self.text_config = CLIPTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=int(arch.get("text_hidden_size", 32)),
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 64)),
            projection_dim=embed, hidden_act="gelu",
            eos_token_id=int(arch.get("vocab_size", 1024)) - 1)
        self.vision_config = EVA02VisionConfig(
            image_size=int(self.properties.get("image_size", 32)),
            patch_size=int(arch.get("patch_size", 16)),
            hidden_size=int(arch.get("vision_hidden_size", 32)),
            num_layers=int(arch.get("vision_layers", 2)),
            num_heads=int(arch.get("vision_heads", 2)),
            swiglu_hidden=int(arch.get("swiglu_hidden", 48)),
            embed_dim=embed)
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        self.params = put_params(self, 
            init_eva02_params(self.text_config, self.vision_config,
                              jax.random.PRNGKey(seed),
                              dtype=self.compute_dtype))
        self._init_tokenizer()

    def _init_tokenizer(self) -> None:
        from marqo_tpu.models.tokenizer import TextTokenizer
        self.tokenizer = TextTokenizer.build_test_wordpiece(
            max_length=self.text_config.max_positions)

    # encode paths reuse the shared CLIP host-preprocess + bucketing
    def _tokenize(self, texts):
        from marqo_tpu.models.clip import JaxCLIPModel
        return JaxCLIPModel._tokenize(self, texts)

    def _preprocess_host(self, content):
        from marqo_tpu.models.clip import JaxCLIPModel
        return JaxCLIPModel._preprocess_host(self, content)

    def encode(self, contents, normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        from marqo_tpu.inference.batching import batched_device_encode
        if modality == Modality.TEXT:
            ids = self._tokenize([str(c) for c in contents])
            out = batched_device_encode(ids, lambda padded: (
                encode_eva02_text_jit(self.params,
                                      _model_put(self, padded),
                                      self.text_config,
                                      compute_dtype=self.compute_dtype)))
        elif modality == Modality.IMAGE:
            pixels = np.stack([self._preprocess_host(c) for c in contents])
            out = batched_device_encode(pixels, lambda padded: (
                encode_eva02_image_jit(self.params,
                                       _model_put(self, padded),
                                       self.vision_config,
                                       compute_dtype=self.compute_dtype)))
        else:
            raise VectoriseError(
                f"Model `{self.model_name}` does not support modality "
                f"{modality.value}")
        out = np.asarray(out, dtype=np.float32)
        if normalize:
            out = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out

    def memory_bytes(self) -> int:
        return self._param_bytes
