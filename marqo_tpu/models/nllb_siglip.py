"""NLLB-SigLIP: M2M-100 (NLLB-200) text encoder + SigLIP vision trunk.

Parity target: the reference serves visheratin/nllb-clip-*-siglip via
open_clip's HF text tower + timm SigLIP trunk
(model_registry.py open_clip section: nllb-clip-base-siglip,
nllb-siglip-mrl-base, nllb-clip-large-siglip, nllb-siglip-mrl-large).

Text tower (VERIFIED offline): transformers ships M2M100, so the JAX
encoder here is parity-tested against a random-init
``transformers.M2M100Model`` encoder (tests/test_nllb_siglip_parity.py):
scaled token embeddings + fairseq sinusoidal positions (padding-aware,
offset 2), pre-LN blocks (ReLU FFN), final LayerNorm, first-token
pooling (the NLLB language-code token = open_clip cls_pooler), linear
projection.

Vision tower: the SigLIP trunk from models/siglip.py (already
torch-mirror parity-tested).

UNVERIFIED part: the open_clip CHECKPOINT PAIRING layout
(``text.transformer.*`` + ``text.proj`` + ``visual.trunk.*`` key names)
cannot be diff-tested offline (open_clip not installed), so loading real
checkpoints requires MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE and warns.
"""

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.core.exceptions import ModelLoadError, VectoriseError
from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.logging import get_logger
from marqo_tpu.parallel.serving import put_params
from marqo_tpu.models.siglip import (SigLIPVisionConfig,
                                     encode_siglip_image_jit,
                                     init_siglip_params)
from marqo_tpu.ops.common import layer_norm

logger = get_logger(__name__)


@dataclass(frozen=True)
class NLLBTextConfig:
    vocab_size: int = 256206        # NLLB-200
    hidden_size: int = 1024
    num_layers: int = 12            # distilled-600M encoder
    num_heads: int = 16
    intermediate_size: int = 4096   # encoder_ffn_dim
    max_positions: int = 1024
    pad_token_id: int = 1
    embed_dim: int = 768
    layer_norm_eps: float = 1e-5


# registry-name → (text cfg overrides, vision (w, L, h, mlp, patch, image))
NLLB_SIGLIP_ARCHS = {
    "nllb-clip-base-siglip": ((1024, 12, 16, 4096, 768),
                              (768, 12, 12, 3072, 16, 384)),
    "nllb-siglip-mrl-base": ((1024, 12, 16, 4096, 768),
                             (768, 12, 12, 3072, 16, 384)),
    # large pairs the 1.3B NLLB encoder (24 layers) with SigLIP SO400M
    "nllb-clip-large-siglip": ((1024, 24, 16, 8192, 1152),
                               (1152, 27, 16, 4304, 14, 384)),
    "nllb-siglip-mrl-large": ((1024, 24, 16, 8192, 1152),
                              (1152, 27, 16, 4304, 14, 384)),
}


def sinusoidal_positions(num_positions: int, dim: int,
                         padding_idx: int = 1) -> np.ndarray:
    """fairseq/M2M100 sinusoidal table: [sin | cos] halves (NOT
    interleaved), row ``padding_idx`` zeroed
    (transformers M2M100SinusoidalPositionalEmbedding.get_embedding)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64)
                  * -(np.log(10000.0) / (half - 1)))
    pos = np.arange(num_positions, dtype=np.float64)
    angles = np.outer(pos, freq)
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate(
            [table, np.zeros((num_positions, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


def _m2m_layer(x, lp, pad_bias, num_heads: int, eps: float):
    """One pre-LN M2M100 encoder layer. x: (B, S, H)."""
    B, S, H = x.shape
    D = H // num_heads
    residual = x
    h = layer_norm(x, lp["attn_ln_scale"], lp["attn_ln_bias"], eps)
    # HF M2M100Attention scales q by D**-0.5 BEFORE the matmul
    q = (jnp.einsum("bsh,hd->bsd", h, lp["q_w"]) + lp["q_b"]) * (D ** -0.5)
    k = jnp.einsum("bsh,hd->bsd", h, lp["k_w"]) + lp["k_b"]
    v = jnp.einsum("bsh,hd->bsd", h, lp["v_w"]) + lp["v_b"]
    qh = q.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    s = s + pad_bias  # (B, 1, 1, S): -inf-ish on padding keys
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    a = a.transpose(0, 2, 1, 3).reshape(B, S, H)
    x = residual + (jnp.einsum("bsh,hd->bsd", a, lp["o_w"]) + lp["o_b"])

    residual = x
    h = layer_norm(x, lp["ffn_ln_scale"], lp["ffn_ln_bias"], eps)
    h = jax.nn.relu(jnp.einsum("bsh,hi->bsi", h, lp["fc1_w"]) + lp["fc1_b"])
    return residual + (jnp.einsum("bsi,ih->bsh", h, lp["fc2_w"])
                       + lp["fc2_b"])


def encode_nllb_text(params: dict, input_ids: jax.Array,
                     config: NLLBTextConfig,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, S) int32 → (B, embed_dim) fp32 (unnormalized).

    Pooling: first token (the NLLB language-code token — open_clip
    cls_pooler), then linear projection."""
    p = params["text"]
    B, S = input_ids.shape
    pad = config.pad_token_id
    mask = (input_ids != pad).astype(jnp.int32)
    # fairseq position ids: cumsum over real tokens + padding_idx
    positions = jnp.cumsum(mask, axis=1) * mask + pad
    x = p["token_embedding"][input_ids] * jnp.sqrt(
        jnp.asarray(config.hidden_size, jnp.float32))
    x = x + p["position_table"][positions]
    x = x.astype(compute_dtype)
    pad_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9
                         ).astype(jnp.float32)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])

    def body(carry, lp):
        return _m2m_layer(carry, lp, pad_bias, config.num_heads,
                          config.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, layers)
    x = layer_norm(x.astype(jnp.float32), p["final_ln_scale"],
                   p["final_ln_bias"], config.layer_norm_eps)
    pooled = x[:, 0, :]
    return pooled @ p["proj_w"].astype(jnp.float32) + \
        p["proj_b"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_nllb_text_jit(params, input_ids, config,
                         compute_dtype=jnp.bfloat16):
    return encode_nllb_text(params, input_ids, config, compute_dtype)


# --- init / conversion -------------------------------------------------------

def init_nllb_text_params(config: NLLBTextConfig, rng,
                          dtype=jnp.float32) -> dict:
    H, I, L = config.hidden_size, config.intermediate_size, config.num_layers
    keys = iter(jax.random.split(rng, 4))
    std = 0.02

    def norm(shape):
        return (jax.random.normal(next(keys), shape) * std).astype(dtype)

    def stack(key, shape):
        return (jax.random.normal(key, (L,) + shape) * std).astype(dtype)

    lkeys = jax.random.split(next(keys), 6)
    layers = {
        "q_w": stack(lkeys[0], (H, H)), "q_b": jnp.zeros((L, H), dtype),
        "k_w": stack(lkeys[1], (H, H)), "k_b": jnp.zeros((L, H), dtype),
        "v_w": stack(lkeys[2], (H, H)), "v_b": jnp.zeros((L, H), dtype),
        "o_w": stack(lkeys[3], (H, H)), "o_b": jnp.zeros((L, H), dtype),
        "attn_ln_scale": jnp.ones((L, H), dtype),
        "attn_ln_bias": jnp.zeros((L, H), dtype),
        "fc1_w": stack(lkeys[4], (H, I)), "fc1_b": jnp.zeros((L, I), dtype),
        "fc2_w": stack(lkeys[5], (I, H)), "fc2_b": jnp.zeros((L, H), dtype),
        "ffn_ln_scale": jnp.ones((L, H), dtype),
        "ffn_ln_bias": jnp.zeros((L, H), dtype),
    }
    return {
        "token_embedding": norm((config.vocab_size, H)),
        "position_table": jnp.asarray(sinusoidal_positions(
            config.max_positions + 2, H, config.pad_token_id)),
        "layers": layers,
        "final_ln_scale": jnp.ones((H,), dtype),
        "final_ln_bias": jnp.zeros((H,), dtype),
        "proj_w": norm((H, config.embed_dim)),
        "proj_b": jnp.zeros((config.embed_dim,), dtype),
    }


def params_from_m2m100_encoder(state_dict, config: NLLBTextConfig,
                               prefix: str = "model.encoder.",
                               proj=None, dtype=jnp.bfloat16) -> dict:
    """Convert a transformers M2M100 encoder state dict. This mapping IS
    offline-verified (tests/test_nllb_siglip_parity.py runs real
    transformers parity). ``proj`` optionally supplies (w, b) for the
    contrastive projection; absent → identity-sized random is NOT used —
    caller must provide or accept missing proj."""

    def t2j(key, transpose=False):
        import torch
        tensor = state_dict[key]
        arr = tensor.detach().to(torch.float32).numpy() \
            if hasattr(tensor, "detach") else np.asarray(tensor)
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, dtype)

    L = config.num_layers

    def stacked(fmt, transpose=False):
        return jnp.stack([t2j(fmt.format(i=i), transpose)
                          for i in range(L)])

    pfx = prefix + "layers.{i}."
    layers = {
        "q_w": stacked(pfx + "self_attn.q_proj.weight", True),
        "q_b": stacked(pfx + "self_attn.q_proj.bias"),
        "k_w": stacked(pfx + "self_attn.k_proj.weight", True),
        "k_b": stacked(pfx + "self_attn.k_proj.bias"),
        "v_w": stacked(pfx + "self_attn.v_proj.weight", True),
        "v_b": stacked(pfx + "self_attn.v_proj.bias"),
        "o_w": stacked(pfx + "self_attn.out_proj.weight", True),
        "o_b": stacked(pfx + "self_attn.out_proj.bias"),
        "attn_ln_scale": stacked(pfx + "self_attn_layer_norm.weight"),
        "attn_ln_bias": stacked(pfx + "self_attn_layer_norm.bias"),
        "fc1_w": stacked(pfx + "fc1.weight", True),
        "fc1_b": stacked(pfx + "fc1.bias"),
        "fc2_w": stacked(pfx + "fc2.weight", True),
        "fc2_b": stacked(pfx + "fc2.bias"),
        "ffn_ln_scale": stacked(pfx + "final_layer_norm.weight"),
        "ffn_ln_bias": stacked(pfx + "final_layer_norm.bias"),
    }
    embed_key = (prefix + "embed_tokens.weight"
                 if prefix + "embed_tokens.weight" in state_dict
                 else "model.shared.weight")
    params = {
        "token_embedding": t2j(embed_key),
        "position_table": jnp.asarray(sinusoidal_positions(
            config.max_positions + 2, config.hidden_size,
            config.pad_token_id)),
        "layers": layers,
        "final_ln_scale": t2j(prefix + "layer_norm.weight"),
        "final_ln_bias": t2j(prefix + "layer_norm.bias"),
    }
    if proj is not None:
        w, b = proj
        params["proj_w"] = jnp.asarray(np.asarray(w), dtype)
        params["proj_b"] = jnp.asarray(np.asarray(b), dtype)
    else:
        params["proj_w"] = jnp.eye(config.hidden_size, config.embed_dim,
                                   dtype=dtype)
        params["proj_b"] = jnp.zeros((config.embed_dim,), dtype)
    return params


class JaxNLLBSigLIPModel:
    """NLLB-SigLIP wrapper: multilingual text + SigLIP image embedding.

    Real open_clip checkpoint loading needs
    MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE (the text tower math is
    transformers-verified; the open_clip pairing key layout is not)."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth=None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.params = None
        self.text_config: Optional[NLLBTextConfig] = None
        self.vision_config: Optional[SigLIPVisionConfig] = None
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
            (self.text_config.embed_dim if self.text_config else 0)

    def _configs_for_name(self):
        name = self.properties.get("name", self.model_name)
        for token, (txt, vis) in NLLB_SIGLIP_ARCHS.items():
            if token in name:
                th, tL, theads, tmlp, embed = txt
                w, L, h, mlp, patch, image = vis
                return (NLLBTextConfig(hidden_size=th, num_layers=tL,
                                       num_heads=theads,
                                       intermediate_size=tmlp,
                                       embed_dim=embed),
                        SigLIPVisionConfig(image_size=image,
                                           patch_size=patch, hidden_size=w,
                                           num_layers=L, num_heads=h,
                                           intermediate_size=mlp))
        return NLLBTextConfig(), SigLIPVisionConfig(image_size=384)

    def load(self) -> None:
        if self.properties.get("localpath") or \
                self.properties.get("model_location"):
            from marqo_tpu.api import configs
            allow = str(configs.read_env_vars_and_defaults(
                "MARQO_ALLOW_UNVERIFIED_CONVERSION") or "").upper() == "TRUE"
            if not allow:
                raise ModelLoadError(
                    f"NLLB-SigLIP model `{self.model_name}`: the open_clip "
                    "checkpoint pairing layout cannot be verified offline "
                    "(open_clip not installed; the M2M-100 text math itself "
                    "IS transformers-verified). Set "
                    "MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE to load anyway, "
                    "or use a SigLIP/ViT CLIP model.")
            logger.warning(
                f"Loading NLLB-SigLIP model `{self.model_name}` with "
                "UNVERIFIED open_clip pairing conversion "
                "(text.transformer.* / text.proj / visual.trunk.* key "
                "names assumed; MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE).")
            self._load_from_checkpoint()
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            raise ModelLoadError(
                f"NLLB-SigLIP model `{self.model_name}` requires an "
                "open_clip checkpoint: provide model_properties.localpath "
                "or a model_location (and "
                "MARQO_ALLOW_UNVERIFIED_CONVERSION).")
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
        proj = None
        if "text.proj.weight" in state:
            proj = (state["text.proj.weight"].detach().to(
                        torch.float32).numpy().T,
                    state["text.proj.bias"].detach().to(
                        torch.float32).numpy()
                    if "text.proj.bias" in state
                    else np.zeros(self.text_config.embed_dim, np.float32))
        text = params_from_m2m100_encoder(
            state, self.text_config, prefix="text.transformer.encoder.",
            proj=proj, dtype=self.compute_dtype)
        from marqo_tpu.models.siglip import params_from_open_clip_siglip
        vision_full = params_from_open_clip_siglip(
            state, None, self.vision_config, dtype=self.compute_dtype,
            vision_only=True)
        self.params = put_params(self, 
            {"text": text, "vision": vision_full["vision"]})
        self._init_tokenizer()

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        embed = int(self.properties.get("dimensions", 64))
        self.text_config = NLLBTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=int(arch.get("text_hidden_size", 32)),
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 64)),
            max_positions=int(arch.get("max_positions", 64)),
            embed_dim=embed)
        self.vision_config = SigLIPVisionConfig(
            image_size=int(self.properties.get("image_size", 32)),
            patch_size=int(arch.get("patch_size", 16)),
            hidden_size=embed,
            num_layers=int(arch.get("vision_layers", 2)),
            num_heads=int(arch.get("vision_heads", 2)),
            intermediate_size=int(arch.get("vision_intermediate", 64)))
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        r1, r2 = jax.random.split(jax.random.PRNGKey(seed))
        from marqo_tpu.models.siglip import SigLIPTextConfig
        dummy_text = SigLIPTextConfig(
            vocab_size=8, hidden_size=8, num_layers=1, num_heads=1,
            intermediate_size=8, embed_dim=embed)
        vision = init_siglip_params(dummy_text, self.vision_config, r1,
                                    dtype=self.compute_dtype)["vision"]
        self.params = put_params(self, 
            {"text": init_nllb_text_params(self.text_config, r2,
                                           dtype=self.compute_dtype),
             "vision": vision})
        self._init_tokenizer()

    def _init_tokenizer(self) -> None:
        from marqo_tpu.models.tokenizer import TextTokenizer
        self.tokenizer = TextTokenizer.build_test_wordpiece(max_length=64)

    def _tokenize(self, texts):
        batch = self.tokenizer.encode_batch(texts, pad_to=None)
        ids = batch["input_ids"] % self.text_config.vocab_size
        # M2M100 reserves pad=1; remap collisions away from pad
        ids = np.where(ids == self.text_config.pad_token_id, 2, ids)
        mask = batch["attention_mask"]
        return np.where(mask > 0, ids,
                        self.text_config.pad_token_id).astype(np.int32)

    def _preprocess_host(self, content):
        from marqo_tpu.models.clip import JaxCLIPModel
        return JaxCLIPModel._preprocess_host(self, content)

    def encode(self, contents, normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        from marqo_tpu.inference.batching import batched_device_encode
        from marqo_tpu.models.clip import _model_put
        if modality == Modality.TEXT:
            ids = self._tokenize([str(c) for c in contents])
            out = batched_device_encode(
                ids, lambda padded: encode_nllb_text_jit(
                    self.params, _model_put(self, padded),
                    self.text_config, compute_dtype=self.compute_dtype),
                pad_value=self.text_config.pad_token_id)
        elif modality == Modality.IMAGE:
            pixels = np.stack([self._preprocess_host(c) for c in contents])
            out = batched_device_encode(
                pixels, lambda padded: encode_siglip_image_jit(
                    self.params, _model_put(self, padded),
                    self.vision_config, compute_dtype=self.compute_dtype))
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
