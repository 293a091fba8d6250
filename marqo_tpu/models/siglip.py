"""SigLIP (sigmoid-loss CLIP) in pure functional JAX.

The reference serves open_clip SigLIP checkpoints (ViT-B-16-SigLIP{,-256,
-384,-512}, ViT-L-16-SigLIP-{256,384}, ViT-SO400M-14-SigLIP{,-384};
model_registry.py open_clip section) through its OPEN_CLIP wrapper. SigLIP
differs from CLIP in both towers, so those state dicts cannot convert into
the ViT-CLIP layout (models/clip.py):

  - Vision (timm ``vit_*_siglip``): patch ViT with NO class token, final
    LayerNorm, then a latent attention-pool head (timm AttentionPoolLatent:
    one learned latent query cross-attends the patch grid, residual MLP);
    no projection (embed dim == vision width).
  - Text (open_clip TextTransformer custom-text config): NO causal mask,
    ln_final then last-token pooling, projection is a Linear WITH bias.
  - Preprocessing: mean/std 0.5 and square resize (no center crop).

Scan-stacked layers, bf16 compute / fp32 statistics like the model zoo.
"""

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.core.exceptions import ModelLoadError, VectoriseError

from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.ops.common import ACTIVATIONS, layer_norm
from marqo_tpu.models.clip import _model_put
from marqo_tpu.parallel.serving import put_params

SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@dataclass(frozen=True)
class SigLIPTextConfig:
    vocab_size: int = 32000
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    context_length: int = 64
    embed_dim: int = 768
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-6


@dataclass(frozen=True)
class SigLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-6


def _mha(q, k, v, num_heads: int):
    B, Sq, H = q.shape
    Sk = k.shape[1]
    D = H // num_heads
    qh = q.reshape(B, Sq, num_heads, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Sk, num_heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Sk, num_heads, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(D, jnp.float32))
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, Sq, H)


def _block(x, lp, num_heads, act_name, eps):
    """Pre-LN block with fused QKV (timm ViT Block / open_clip resblock —
    identical math, both converted to split q/k/v weights)."""
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
    q = jnp.einsum("bsh,hd->bsd", h, lp["q_w"]) + lp["q_b"]
    k = jnp.einsum("bsh,hd->bsd", h, lp["k_w"]) + lp["k_b"]
    v = jnp.einsum("bsh,hd->bsd", h, lp["v_w"]) + lp["v_b"]
    a = _mha(q, k, v, num_heads)
    x = x + (jnp.einsum("bsh,hd->bsd", a, lp["o_w"]) + lp["o_b"])
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    h = ACTIVATIONS[act_name](
        jnp.einsum("bsh,hi->bsi", h, lp["mlp_w1"]) + lp["mlp_b1"])
    return x + (jnp.einsum("bsi,ih->bsh", h, lp["mlp_w2"]) + lp["mlp_b2"])


def _run_blocks(x, layers, num_heads, act_name, eps):
    def body(carry, lp):
        return _block(carry, lp, num_heads, act_name, eps), None
    x, _ = jax.lax.scan(body, x, layers)
    return x


def encode_siglip_text(params: dict, input_ids: jax.Array,
                       config: SigLIPTextConfig,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, context_length) int32 → (B, embed_dim) fp32 (unnormalized).

    open_clip TextTransformer with no_causal_mask + pool_type='last' +
    proj_bias: ln_final over all tokens, pooled = x[:, -1], Linear proj."""
    p = params["text"]
    S = input_ids.shape[1]
    x = p["token_embedding"][input_ids] + p["position_embedding"][:S][None]
    x = x.astype(compute_dtype)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])
    x = _run_blocks(x, layers, config.num_heads, config.hidden_act,
                    config.layer_norm_eps)
    x = layer_norm(x.astype(jnp.float32), p["final_ln_scale"],
                   p["final_ln_bias"], config.layer_norm_eps)
    pooled = x[:, -1, :]
    return pooled @ p["proj_w"].astype(jnp.float32) + \
        p["proj_b"].astype(jnp.float32)


def encode_siglip_image(params: dict, pixels_u8: jax.Array,
                        config: SigLIPVisionConfig,
                        compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, hidden_size) fp32 (unnormalized).

    timm vit_siglip: patch embed (no class token) → blocks → final LN →
    latent attention pool (single query; residual MLP)."""
    p = params["vision"]
    B = pixels_u8.shape[0]
    size, patch = config.image_size, config.patch_size
    n_side = size // patch
    x = pixels_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(SIGLIP_MEAN)) / jnp.asarray(SIGLIP_STD)
    # conv-stride semantics when size % patch != 0 (e.g. SO400M-14 at
    # 384px → 27x27 grid over the first 378px): drop the remainder like
    # the torch stride-14 conv does
    used = n_side * patch
    if used != size:
        x = x[:, :used, :used, :]
    x = x.reshape(B, n_side, patch, n_side, patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n_side * n_side,
                                              patch * patch * 3)
    x = x.astype(compute_dtype)
    x = jnp.einsum("bnp,ph->bnh", x,
                   p["patch_embedding"].astype(compute_dtype))
    x = x + p["patch_bias"].astype(compute_dtype)
    x = x + p["position_embedding"].astype(compute_dtype)[None]
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])
    x = _run_blocks(x, layers, config.num_heads, config.hidden_act,
                    config.layer_norm_eps)
    x = layer_norm(x, p["final_ln_scale"], p["final_ln_bias"],
                   config.layer_norm_eps).astype(compute_dtype)

    # latent attention pool (timm AttentionPoolLatent, latent_len=1)
    ap = p["attn_pool"]
    latent = jnp.broadcast_to(ap["latent"].astype(compute_dtype),
                              (B, 1, config.hidden_size))
    q = jnp.einsum("bqh,hd->bqd", latent, ap["q_w"].astype(compute_dtype)) \
        + ap["q_b"].astype(compute_dtype)
    k = jnp.einsum("bsh,hd->bsd", x, ap["k_w"].astype(compute_dtype)) \
        + ap["k_b"].astype(compute_dtype)
    v = jnp.einsum("bsh,hd->bsd", x, ap["v_w"].astype(compute_dtype)) \
        + ap["v_b"].astype(compute_dtype)
    o = _mha(q, k, v, config.num_heads)
    o = jnp.einsum("bqh,hd->bqd", o, ap["o_w"].astype(compute_dtype)) \
        + ap["o_b"].astype(compute_dtype)
    h = layer_norm(o.astype(jnp.float32), ap["norm_scale"], ap["norm_bias"],
                   config.layer_norm_eps).astype(compute_dtype)
    h = ACTIVATIONS[config.hidden_act](
        jnp.einsum("bqh,hi->bqi", h, ap["mlp_w1"].astype(compute_dtype))
        + ap["mlp_b1"].astype(compute_dtype))
    h = jnp.einsum("bqi,ih->bqh", h, ap["mlp_w2"].astype(compute_dtype)) \
        + ap["mlp_b2"].astype(compute_dtype)
    out = (o + h)[:, 0, :]
    return out.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_siglip_text_jit(params, input_ids, config,
                           compute_dtype=jnp.bfloat16):
    return encode_siglip_text(params, input_ids, config, compute_dtype)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_siglip_image_jit(params, pixels_u8, config,
                            compute_dtype=jnp.bfloat16):
    return encode_siglip_image(params, pixels_u8, config, compute_dtype)


# --- init + conversion ----------------------------------------------------------

def _init_blocks(rng, L, H, I, dtype):
    k = jax.random.split(rng, 6)
    std = 0.02

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    return {
        "q_w": norm(k[0], (L, H, H)), "q_b": jnp.zeros((L, H), dtype),
        "k_w": norm(k[1], (L, H, H)), "k_b": jnp.zeros((L, H), dtype),
        "v_w": norm(k[2], (L, H, H)), "v_b": jnp.zeros((L, H), dtype),
        "o_w": norm(k[3], (L, H, H)), "o_b": jnp.zeros((L, H), dtype),
        "ln1_scale": jnp.ones((L, H), dtype),
        "ln1_bias": jnp.zeros((L, H), dtype),
        "ln2_scale": jnp.ones((L, H), dtype),
        "ln2_bias": jnp.zeros((L, H), dtype),
        "mlp_w1": norm(k[4], (L, H, I)), "mlp_b1": jnp.zeros((L, I), dtype),
        "mlp_w2": norm(k[5], (L, I, H)), "mlp_b2": jnp.zeros((L, H), dtype),
    }


def init_siglip_params(text_config: SigLIPTextConfig,
                       vision_config: SigLIPVisionConfig, rng,
                       dtype=jnp.float32) -> dict:
    kt, kv, k1, k2, k3, k4 = jax.random.split(rng, 6)
    std = 0.02
    Ht, Hv = text_config.hidden_size, vision_config.hidden_size
    n_patches = (vision_config.image_size // vision_config.patch_size) ** 2

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    return {
        "text": {
            "token_embedding": norm(k1, (text_config.vocab_size, Ht)),
            "position_embedding": norm(k2, (text_config.context_length, Ht)),
            "layers": _init_blocks(kt, text_config.num_layers, Ht,
                                   text_config.intermediate_size, dtype),
            "final_ln_scale": jnp.ones((Ht,), dtype),
            "final_ln_bias": jnp.zeros((Ht,), dtype),
            "proj_w": norm(k3, (Ht, text_config.embed_dim)),
            "proj_b": jnp.zeros((text_config.embed_dim,), dtype),
        },
        "vision": {
            "patch_embedding": norm(
                k4, (vision_config.patch_size ** 2 * 3, Hv)),
            "patch_bias": jnp.zeros((Hv,), dtype),
            "position_embedding": norm(
                jax.random.fold_in(kv, 1), (n_patches, Hv)),
            "layers": _init_blocks(kv, vision_config.num_layers, Hv,
                                   vision_config.intermediate_size, dtype),
            "final_ln_scale": jnp.ones((Hv,), dtype),
            "final_ln_bias": jnp.zeros((Hv,), dtype),
            "attn_pool": {
                "latent": norm(jax.random.fold_in(kv, 2), (1, Hv)),
                "q_w": norm(jax.random.fold_in(kv, 3), (Hv, Hv)),
                "q_b": jnp.zeros((Hv,), dtype),
                "k_w": norm(jax.random.fold_in(kv, 4), (Hv, Hv)),
                "k_b": jnp.zeros((Hv,), dtype),
                "v_w": norm(jax.random.fold_in(kv, 5), (Hv, Hv)),
                "v_b": jnp.zeros((Hv,), dtype),
                "o_w": norm(jax.random.fold_in(kv, 6), (Hv, Hv)),
                "o_b": jnp.zeros((Hv,), dtype),
                "norm_scale": jnp.ones((Hv,), dtype),
                "norm_bias": jnp.zeros((Hv,), dtype),
                "mlp_w1": norm(jax.random.fold_in(kv, 7),
                               (Hv, vision_config.intermediate_size)),
                "mlp_b1": jnp.zeros((vision_config.intermediate_size,),
                                    dtype),
                "mlp_w2": norm(jax.random.fold_in(kv, 8),
                               (vision_config.intermediate_size, Hv)),
                "mlp_b2": jnp.zeros((Hv,), dtype),
            },
        },
    }


def params_from_open_clip_siglip(state_dict,
                                 text_config: SigLIPTextConfig,
                                 vision_config: SigLIPVisionConfig,
                                 dtype=jnp.float32,
                                 vision_only: bool = False) -> dict:
    """Convert an open_clip SigLIP state dict (text.* open_clip naming;
    visual.trunk.* timm naming incl. attn_pool). ``vision_only`` skips
    the text half (NLLB-SigLIP pairs this trunk with an M2M-100 text
    tower, models/nllb_siglip.py)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}

    def text_blocks(prefix, L):
        from marqo_tpu.models.clip import convert_open_clip_resblocks
        return convert_open_clip_resblocks(sd, prefix, L, dtype)

    def timm_blocks(prefix, L, H):
        out = {k: [] for k in ("q_w", "q_b", "k_w", "k_b", "v_w", "v_b",
                               "o_w", "o_b", "ln1_scale", "ln1_bias",
                               "ln2_scale", "ln2_bias", "mlp_w1", "mlp_b1",
                               "mlp_w2", "mlp_b2")}
        for i in range(L):
            base = f"{prefix}.{i}"
            qkv_w = sd[f"{base}.attn.qkv.weight"]  # (3H, H)
            qkv_b = sd[f"{base}.attn.qkv.bias"]
            qw, kw, vw = np.split(qkv_w, 3, axis=0)
            qb, kb, vb = np.split(qkv_b, 3, axis=0)
            out["q_w"].append(qw.T); out["q_b"].append(qb)
            out["k_w"].append(kw.T); out["k_b"].append(kb)
            out["v_w"].append(vw.T); out["v_b"].append(vb)
            out["o_w"].append(sd[f"{base}.attn.proj.weight"].T)
            out["o_b"].append(sd[f"{base}.attn.proj.bias"])
            out["ln1_scale"].append(sd[f"{base}.norm1.weight"])
            out["ln1_bias"].append(sd[f"{base}.norm1.bias"])
            out["mlp_w1"].append(sd[f"{base}.mlp.fc1.weight"].T)
            out["mlp_b1"].append(sd[f"{base}.mlp.fc1.bias"])
            out["mlp_w2"].append(sd[f"{base}.mlp.fc2.weight"].T)
            out["mlp_b2"].append(sd[f"{base}.mlp.fc2.bias"])
            out["ln2_scale"].append(sd[f"{base}.norm2.weight"])
            out["ln2_bias"].append(sd[f"{base}.norm2.bias"])
        return {k: jnp.asarray(np.stack(v), dtype) for k, v in out.items()}

    trunk = "visual.trunk"
    conv = sd[f"{trunk}.patch_embed.proj.weight"]  # (Hv, 3, p, p)
    Hv = conv.shape[0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, Hv)
    pos = sd[f"{trunk}.pos_embed"]
    if pos.ndim == 3:  # timm stores (1, n, H)
        pos = pos[0]
    ap = f"{trunk}.attn_pool"
    kv_w = sd[f"{ap}.kv.weight"]  # (2H, H)
    kv_b = sd[f"{ap}.kv.bias"]
    kw, vw = np.split(kv_w, 2, axis=0)
    kb, vb = np.split(kv_b, 2, axis=0)
    latent = sd[f"{ap}.latent"]
    if latent.ndim == 3:  # (1, 1, H)
        latent = latent[0]

    text = None
    if not vision_only:
        text = {
            "token_embedding": jnp.asarray(
                sd["text.token_embedding.weight"], dtype),
            "position_embedding": jnp.asarray(
                sd["text.positional_embedding"], dtype),
            "layers": text_blocks("text.transformer.resblocks",
                                  text_config.num_layers),
            "final_ln_scale": jnp.asarray(sd["text.ln_final.weight"], dtype),
            "final_ln_bias": jnp.asarray(sd["text.ln_final.bias"], dtype),
            # proj_bias=True → Linear (weight stored (out, in))
            "proj_w": jnp.asarray(sd["text.text_projection.weight"].T, dtype),
            "proj_b": jnp.asarray(sd["text.text_projection.bias"], dtype),
        }
    return {
        "text": text,
        "vision": {
            "patch_embedding": jnp.asarray(patch_w, dtype),
            "patch_bias": jnp.asarray(
                sd[f"{trunk}.patch_embed.proj.bias"], dtype),
            "position_embedding": jnp.asarray(pos, dtype),
            "layers": timm_blocks(f"{trunk}.blocks",
                                  vision_config.num_layers, Hv),
            "final_ln_scale": jnp.asarray(sd[f"{trunk}.norm.weight"], dtype),
            "final_ln_bias": jnp.asarray(sd[f"{trunk}.norm.bias"], dtype),
            "attn_pool": {
                "latent": jnp.asarray(latent, dtype),
                "q_w": jnp.asarray(sd[f"{ap}.q.weight"].T, dtype),
                "q_b": jnp.asarray(sd[f"{ap}.q.bias"], dtype),
                "k_w": jnp.asarray(kw.T, dtype),
                "k_b": jnp.asarray(kb, dtype),
                "v_w": jnp.asarray(vw.T, dtype),
                "v_b": jnp.asarray(vb, dtype),
                "o_w": jnp.asarray(sd[f"{ap}.proj.weight"].T, dtype),
                "o_b": jnp.asarray(sd[f"{ap}.proj.bias"], dtype),
                "norm_scale": jnp.asarray(sd[f"{ap}.norm.weight"], dtype),
                "norm_bias": jnp.asarray(sd[f"{ap}.norm.bias"], dtype),
                "mlp_w1": jnp.asarray(sd[f"{ap}.mlp.fc1.weight"].T, dtype),
                "mlp_b1": jnp.asarray(sd[f"{ap}.mlp.fc1.bias"], dtype),
                "mlp_w2": jnp.asarray(sd[f"{ap}.mlp.fc2.weight"].T, dtype),
                "mlp_b2": jnp.asarray(sd[f"{ap}.mlp.fc2.bias"], dtype),
            },
        },
    }


# --- wrapper ---------------------------------------------------------------------

_SIGLIP_ARCHS = {
    # registry arch token → (vision (w, L, heads, mlp, patch),
    #                        text (w, L, heads, mlp))
    "ViT-B-16-SigLIP": ((768, 12, 12, 3072, 16), (768, 12, 12, 3072)),
    "ViT-L-16-SigLIP": ((1024, 24, 16, 4096, 16), (1024, 24, 16, 4096)),
    "ViT-SO400M-14-SigLIP": ((1152, 27, 16, 4304, 14),
                             (1152, 27, 16, 4304)),
}


class JaxSigLIPModel:
    """SigLIP wrapper (text + image embedding)."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth=None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.params = None
        self.text_config: Optional[SigLIPTextConfig] = None
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
        image_size = int(self.properties.get("image_size", 224))
        for token, (vis, txt) in _SIGLIP_ARCHS.items():
            if token in name:
                w, L, h, mlp, patch = vis
                tw, tL, th, tmlp = txt
                return (SigLIPTextConfig(hidden_size=tw, num_layers=tL,
                                         num_heads=th,
                                         intermediate_size=tmlp,
                                         embed_dim=w),
                        SigLIPVisionConfig(image_size=image_size,
                                           patch_size=patch, hidden_size=w,
                                           num_layers=L, num_heads=h,
                                           intermediate_size=mlp))
        return (SigLIPTextConfig(),
                SigLIPVisionConfig(image_size=image_size))

    def load(self) -> None:
        if self.properties.get("localpath"):
            self._load_from_checkpoint(self.properties["localpath"])
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            raise ModelLoadError(
                f"SigLIP model `{self.model_name}` requires an open_clip "
                "checkpoint: provide model_properties.localpath or a "
                "model_location. The architecture runs natively in JAX.")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_checkpoint(self, path: str) -> None:
        import os

        import torch
        self.text_config, self.vision_config = self._configs_for_name()
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
        self.params = put_params(self, 
            params_from_open_clip_siglip(state, self.text_config,
                                         self.vision_config,
                                         dtype=self.compute_dtype))
        self._init_tokenizer(checkpoint=path)

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        dims = int(self.properties.get("dimensions", 64))
        self.text_config = SigLIPTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=dims,
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 128)),
            context_length=int(arch.get("context_length", 64)),
            embed_dim=dims)
        self.vision_config = SigLIPVisionConfig(
            image_size=int(self.properties.get("image_size", 224)),
            patch_size=int(arch.get("patch_size", 32)),
            hidden_size=dims,
            num_layers=int(arch.get("vision_layers", 2)),
            num_heads=int(arch.get("vision_heads", 2)),
            intermediate_size=int(arch.get("vision_intermediate", 128)))
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        self.params = put_params(self, 
            init_siglip_params(self.text_config, self.vision_config,
                               jax.random.PRNGKey(seed),
                               dtype=self.compute_dtype))
        self._init_tokenizer()

    def _init_tokenizer(self, checkpoint: str = None) -> None:
        from marqo_tpu.models.tokenizer import resolve_model_tokenizer
        self.tokenizer = resolve_model_tokenizer(
            self.properties, max_length=self.text_config.context_length,
            checkpoint_path=checkpoint,
            allow_test=bool(self.properties.get("random_init")))

    # -- encoding -----------------------------------------------------------

    def encode(self, contents: List[Any], normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
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

    def _encode_text(self, texts: List[str]) -> np.ndarray:
        # SigLIP pools the LAST position: pad to the full context length
        batch = self.tokenizer.encode_batch(
            texts, pad_to=self.text_config.context_length)
        ids = (batch["input_ids"] % self.text_config.vocab_size).astype(
            np.int32)
        from marqo_tpu.inference.batching import batched_device_encode
        return batched_device_encode(
            ids, lambda padded: encode_siglip_text_jit(
                self.params,
                _model_put(self, padded),
                self.text_config, compute_dtype=self.compute_dtype))

    def _preprocess_host(self, content) -> np.ndarray:
        """SigLIP preprocessing: square resize (no crop), mean/std 0.5."""
        from PIL import Image

        from marqo_tpu.ops.image_ops import host_decode
        size = self.vision_config.image_size
        arr = host_decode(content)
        img = Image.fromarray(arr).resize((size, size), Image.BICUBIC)
        return np.asarray(img, dtype=np.uint8)

    def _encode_images(self, contents: List[Any]) -> np.ndarray:
        pixels = np.stack([self._preprocess_host(c) for c in contents])
        from marqo_tpu.inference.batching import batched_device_encode
        return batched_device_encode(
            pixels, lambda padded: encode_siglip_image_jit(
                self.params,
                _model_put(self, padded),
                self.vision_config, compute_dtype=self.compute_dtype))

    def memory_bytes(self) -> int:
        return self._param_bytes
