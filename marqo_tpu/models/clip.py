"""CLIP-family models (text + vision towers) in pure functional JAX.

Covers the reference's CLIP families — openai CLIP (clip_utils.py:295),
open_clip (core/inference/embedding_models/open_clip_model.py:28),
FP16-CLIP, multilingual CLIP — as one implementation:

  - Vision tower: ViT with patch-embedding as a single matmul over
    unfolded patches (stride == patch size ⇒ a reshape, no conv needed —
    MXU-friendly), class token, pre-LN blocks via lax.scan, post-LN on the
    class token, linear projection.
  - Text tower: byte-pair token ids, causal pre-LN transformer, final LN,
    EOS-position pooling, linear projection.
  - Preprocessing: host decodes/EXIF-orients/resizes (PIL, uint8, exact
    torchvision parity — the #1 numerical-parity risk, SURVEY.md §7);
    normalize + patch-embed are fused into the jit so pixels cross
    host→HBM once as uint8. A fully on-device resize path exists in
    ops/image_ops.py for fixed-shape media streams.

Checkpoint conversion supports both HF CLIPModel and open_clip/openai
state-dict naming.
"""

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.core.exceptions import ModelLoadError, VectoriseError
from marqo_tpu.inference.batching import pick_batch_bucket
from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.logging import get_logger
from marqo_tpu.ops.common import ACTIVATIONS, layer_norm
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD, host_decode

logger = get_logger(__name__)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_positions: int = 77
    projection_dim: int = 512
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


def _model_put(model, arr):
    """Mesh-aware input placement shared across ALL model-family wrappers:
    batch-shards across dp when the process serving mesh spans the
    model's device and the leading dim divides (parallel/serving.py
    model_mesh resolves lazily — wrappers need no mesh-aware __init__)."""
    from marqo_tpu.parallel.serving import (data_sharding, dp_size,
                                            model_mesh)
    mesh = model_mesh(model)
    arr = jnp.asarray(arr)
    if mesh is not None:
        if arr.ndim >= 1 and arr.shape[0] % dp_size(mesh) == 0:
            return jax.device_put(arr, data_sharding(mesh))
    return jax.device_put(arr, model._jdevice)


# --- shared pre-LN transformer over scanned layer stacks --------------------

def _prenorm_block(x, lp, num_heads: int, act_name: str, eps: float,
                   causal: bool, pad_mask: Optional[jax.Array]):
    B, S, H = x.shape
    D = H // num_heads

    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)

    def proj(w, b):
        return (jnp.einsum("bsh,hd->bsd", h, w) + b).reshape(
            B, S, num_heads, D).transpose(0, 2, 1, 3)

    q = proj(lp["q_w"], lp["q_b"])
    k = proj(lp["k_w"], lp["k_b"])
    v = proj(lp["v_w"], lp["v_b"])

    from marqo_tpu.ops.fused_attention import (flash_enabled, fused_attention,
                                               supports)
    if (not causal and flash_enabled()
            and supports(S, masked=pad_mask is not None)):
        # fused Mosaic flash kernel: the ViT image towers' whole gap to
        # speed-of-light is XLA's HBM-bound (B,N,S,S) score tensors
        # (BENCH_NOTES ViT-L ablation); scores stay in VMEM here
        ctx = fused_attention(q, k, v, pad_mask=pad_mask).astype(q.dtype)
    else:
        scale = 1.0 / jnp.sqrt(D).astype(q.dtype)
        scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
        scores = scores.astype(jnp.float32)
        if causal:
            causal_bias = jnp.triu(
                jnp.full((S, S), -1e9, dtype=jnp.float32), k=1)
            scores = scores + causal_bias[None, None, :, :]
        if pad_mask is not None:
            scores = scores + jnp.where(pad_mask[:, None, None, :] > 0,
                                        0.0, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bnst,bntd->bnsd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
    x = x + (jnp.einsum("bsh,hd->bsd", ctx, lp["o_w"]) + lp["o_b"])

    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    act = ACTIVATIONS[act_name]
    h = act(jnp.einsum("bsh,hi->bsi", h, lp["mlp_w1"]) + lp["mlp_b1"])
    x = x + (jnp.einsum("bsi,ih->bsh", h, lp["mlp_w2"]) + lp["mlp_b2"])
    return x


def _run_blocks(x, layers, num_heads, act_name, eps, causal=False,
                pad_mask=None):
    def body(carry, lp):
        return _prenorm_block(carry, lp, num_heads, act_name, eps, causal,
                              pad_mask), None

    x, _ = jax.lax.scan(body, x, layers)
    return x


# --- encoders ----------------------------------------------------------------

def encode_clip_text(params: dict, input_ids: jax.Array,
                     config: CLIPTextConfig,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, S) int32 → (B, projection_dim) fp32 (unnormalized).

    The token axis is padded to a multiple of 8 for MXU tiling (77 → 80);
    under causal attention trailing pad tokens can never influence real
    positions, so no masking is needed."""
    p = params["text"]
    B, S = input_ids.shape
    padded = -(-S // 8) * 8
    if padded != S:
        input_ids = jnp.pad(input_ids, ((0, 0), (0, padded - S)))
    pos = p["position_embedding"]
    if pos.shape[0] < padded:
        pos = jnp.pad(pos, ((0, padded - pos.shape[0]), (0, 0)))
    x = p["token_embedding"][input_ids] + pos[:padded][None]
    x = x.astype(compute_dtype)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])
    x = _run_blocks(x, layers, config.num_heads, config.hidden_act,
                    config.layer_norm_eps, causal=True)
    x = layer_norm(x, p["final_ln_scale"], p["final_ln_bias"],
                   config.layer_norm_eps)
    # EOS pooling: position of the eos token (HF CLIP uses the first
    # occurrence of eos_token_id; openai uses argmax token id — identical
    # for standard tokenizers where eos is the max id)
    eos_pos = jnp.argmax(
        (input_ids == config.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(B), eos_pos].astype(jnp.float32)
    return pooled @ p["text_projection"].astype(jnp.float32)


def encode_clip_image(params: dict, pixels_u8: jax.Array,
                      config: CLIPVisionConfig,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, projection_dim) fp32 (unnormalized).

    Normalize + patch-embed run fused on device (uint8 in, one matmul)."""
    p = params["vision"]
    B = pixels_u8.shape[0]
    size, patch = config.image_size, config.patch_size
    n_side = size // patch

    x = pixels_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    # unfold into patches: (B, n, p*p*3) — stride == kernel ⇒ pure reshape
    x = x.reshape(B, n_side, patch, n_side, patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n_side * n_side,
                                              patch * patch * 3)
    x = x.astype(compute_dtype)
    x = jnp.einsum("bnp,ph->bnh", x, p["patch_embedding"].astype(compute_dtype))
    cls = jnp.broadcast_to(p["class_embedding"].astype(compute_dtype),
                           (B, 1, config.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(compute_dtype)[None]
    if "pre_ln_scale" in p:
        x = layer_norm(x, p["pre_ln_scale"], p["pre_ln_bias"],
                       config.layer_norm_eps)
        x = x.astype(compute_dtype)
    # pad the token axis to a multiple of 8 (MXU sublane tiling): e.g.
    # ViT-B/32's 50 tokens → 56 with the extras key-masked out
    n_tokens = x.shape[1]
    padded_tokens = -(-n_tokens // 8) * 8
    pad_mask = None
    if padded_tokens != n_tokens:
        x = jnp.pad(x, ((0, 0), (0, padded_tokens - n_tokens), (0, 0)))
        pad_mask = jnp.concatenate([
            jnp.ones((B, n_tokens), jnp.int32),
            jnp.zeros((B, padded_tokens - n_tokens), jnp.int32)], axis=1)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])
    x = _run_blocks(x, layers, config.num_heads, config.hidden_act,
                    config.layer_norm_eps, causal=False, pad_mask=pad_mask)
    pooled = layer_norm(x[:, 0, :], p["post_ln_scale"], p["post_ln_bias"],
                        config.layer_norm_eps).astype(jnp.float32)
    return pooled @ p["visual_projection"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_clip_text_jit(params, input_ids, config,
                         compute_dtype=jnp.bfloat16):
    return encode_clip_text(params, input_ids, config, compute_dtype)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_clip_image_jit(params, pixels_u8, config,
                          compute_dtype=jnp.bfloat16):
    return encode_clip_image(params, pixels_u8, config, compute_dtype)


# --- init + conversion --------------------------------------------------------

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
        "ln1_scale": jnp.ones((L, H), dtype), "ln1_bias": jnp.zeros((L, H), dtype),
        "ln2_scale": jnp.ones((L, H), dtype), "ln2_bias": jnp.zeros((L, H), dtype),
        "mlp_w1": norm(k[4], (L, H, I)), "mlp_b1": jnp.zeros((L, I), dtype),
        "mlp_w2": norm(k[5], (L, I, H)), "mlp_b2": jnp.zeros((L, H), dtype),
    }


def init_clip_params(text_config: CLIPTextConfig,
                     vision_config: CLIPVisionConfig, rng,
                     dtype=jnp.float32) -> dict:
    kt, kv, k1, k2, k3, k4, k5 = jax.random.split(rng, 7)
    std = 0.02
    Ht, Hv = text_config.hidden_size, vision_config.hidden_size
    n_patches = (vision_config.image_size // vision_config.patch_size) ** 2
    return {
        "text": {
            "token_embedding": (jax.random.normal(
                k1, (text_config.vocab_size, Ht)) * std).astype(dtype),
            "position_embedding": (jax.random.normal(
                k2, (text_config.max_positions, Ht)) * std).astype(dtype),
            "layers": _init_blocks(kt, text_config.num_layers, Ht,
                                   text_config.intermediate_size, dtype),
            "final_ln_scale": jnp.ones((Ht,), dtype),
            "final_ln_bias": jnp.zeros((Ht,), dtype),
            "text_projection": (jax.random.normal(
                k3, (Ht, text_config.projection_dim)) * std).astype(dtype),
        },
        "vision": {
            "patch_embedding": (jax.random.normal(
                k4, (vision_config.patch_size ** 2 * 3, Hv)) * std).astype(dtype),
            "class_embedding": (jax.random.normal(k5, (Hv,)) * std).astype(dtype),
            "position_embedding": (jax.random.normal(
                jax.random.fold_in(kv, 1), (n_patches + 1, Hv)) * std).astype(dtype),
            "pre_ln_scale": jnp.ones((Hv,), dtype),
            "pre_ln_bias": jnp.zeros((Hv,), dtype),
            "layers": _init_blocks(kv, vision_config.num_layers, Hv,
                                   vision_config.intermediate_size, dtype),
            "post_ln_scale": jnp.ones((Hv,), dtype),
            "post_ln_bias": jnp.zeros((Hv,), dtype),
            "visual_projection": (jax.random.normal(
                jax.random.fold_in(kv, 2),
                (Hv, vision_config.projection_dim)) * std).astype(dtype),
        },
    }


def params_from_hf_clip(state_dict, text_config: CLIPTextConfig,
                        vision_config: CLIPVisionConfig,
                        dtype=jnp.float32) -> dict:
    """Convert an HF transformers CLIPModel state_dict."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}

    def stack(prefix, name, L, transpose=False):
        arrs = []
        for i in range(L):
            a = sd[f"{prefix}.{i}.{name}"]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype)

    def blocks(prefix, L):
        return {
            "q_w": stack(prefix, "self_attn.q_proj.weight", L, True),
            "q_b": stack(prefix, "self_attn.q_proj.bias", L),
            "k_w": stack(prefix, "self_attn.k_proj.weight", L, True),
            "k_b": stack(prefix, "self_attn.k_proj.bias", L),
            "v_w": stack(prefix, "self_attn.v_proj.weight", L, True),
            "v_b": stack(prefix, "self_attn.v_proj.bias", L),
            "o_w": stack(prefix, "self_attn.out_proj.weight", L, True),
            "o_b": stack(prefix, "self_attn.out_proj.bias", L),
            "ln1_scale": stack(prefix, "layer_norm1.weight", L),
            "ln1_bias": stack(prefix, "layer_norm1.bias", L),
            "mlp_w1": stack(prefix, "mlp.fc1.weight", L, True),
            "mlp_b1": stack(prefix, "mlp.fc1.bias", L),
            "mlp_w2": stack(prefix, "mlp.fc2.weight", L, True),
            "mlp_b2": stack(prefix, "mlp.fc2.bias", L),
            "ln2_scale": stack(prefix, "layer_norm2.weight", L),
            "ln2_bias": stack(prefix, "layer_norm2.bias", L),
        }

    # HF stores patch conv as (H, 3, p, p); our layout is (p*p*3, H) over
    # patches laid out (p, p, 3)
    conv = sd["vision_model.embeddings.patch_embedding.weight"]
    H = conv.shape[0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, H)

    # pre-LN key: HF ships the typo'd name "pre_layrnorm"
    pre_ln_w = sd.get("vision_model.pre_layrnorm.weight",
                      sd.get("vision_model.pre_layernorm.weight"))
    pre_ln_b = sd.get("vision_model.pre_layrnorm.bias",
                      sd.get("vision_model.pre_layernorm.bias"))

    params = {
        "text": {
            "token_embedding": jnp.asarray(
                sd["text_model.embeddings.token_embedding.weight"], dtype),
            "position_embedding": jnp.asarray(
                sd["text_model.embeddings.position_embedding.weight"], dtype),
            "layers": blocks("text_model.encoder.layers",
                             text_config.num_layers),
            "final_ln_scale": jnp.asarray(
                sd["text_model.final_layer_norm.weight"], dtype),
            "final_ln_bias": jnp.asarray(
                sd["text_model.final_layer_norm.bias"], dtype),
            "text_projection": jnp.asarray(
                sd["text_projection.weight"].T, dtype),
        },
        "vision": {
            "patch_embedding": jnp.asarray(patch_w, dtype),
            "class_embedding": jnp.asarray(
                sd["vision_model.embeddings.class_embedding"], dtype),
            "position_embedding": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"], dtype),
            "layers": blocks("vision_model.encoder.layers",
                             vision_config.num_layers),
            "post_ln_scale": jnp.asarray(
                sd["vision_model.post_layernorm.weight"], dtype),
            "post_ln_bias": jnp.asarray(
                sd["vision_model.post_layernorm.bias"], dtype),
            "visual_projection": jnp.asarray(
                sd["visual_projection.weight"].T, dtype),
        },
    }
    if pre_ln_w is not None:
        params["vision"]["pre_ln_scale"] = jnp.asarray(pre_ln_w, dtype)
        params["vision"]["pre_ln_bias"] = jnp.asarray(pre_ln_b, dtype)
    return params


def convert_open_clip_resblocks(sd: dict, prefix: str, L: int,
                                dtype=jnp.float32) -> dict:
    """Stack L open_clip ResidualAttentionBlocks ({prefix}.{i}.attn with
    fused in_proj, ln_1/ln_2, mlp.c_fc/c_proj) into the scan-layer pytree.
    Shared by every open_clip-family converter (clip/coca/siglip/resnet/
    hf composites) — the key mapping lives in exactly one place."""
    out = {k: [] for k in ("q_w", "q_b", "k_w", "k_b", "v_w", "v_b",
                           "o_w", "o_b", "ln1_scale", "ln1_bias",
                           "ln2_scale", "ln2_bias", "mlp_w1", "mlp_b1",
                           "mlp_w2", "mlp_b2")}
    for i in range(L):
        base = f"{prefix}.{i}"
        in_w = sd[f"{base}.attn.in_proj_weight"]  # (3H, H)
        in_b = sd[f"{base}.attn.in_proj_bias"]
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        out["q_w"].append(qw.T); out["q_b"].append(qb)
        out["k_w"].append(kw.T); out["k_b"].append(kb)
        out["v_w"].append(vw.T); out["v_b"].append(vb)
        out["o_w"].append(sd[f"{base}.attn.out_proj.weight"].T)
        out["o_b"].append(sd[f"{base}.attn.out_proj.bias"])
        out["ln1_scale"].append(sd[f"{base}.ln_1.weight"])
        out["ln1_bias"].append(sd[f"{base}.ln_1.bias"])
        out["mlp_w1"].append(sd[f"{base}.mlp.c_fc.weight"].T)
        out["mlp_b1"].append(sd[f"{base}.mlp.c_fc.bias"])
        out["mlp_w2"].append(sd[f"{base}.mlp.c_proj.weight"].T)
        out["mlp_b2"].append(sd[f"{base}.mlp.c_proj.bias"])
        out["ln2_scale"].append(sd[f"{base}.ln_2.weight"])
        out["ln2_bias"].append(sd[f"{base}.ln_2.bias"])
    return {k: jnp.asarray(np.stack(v), dtype) for k, v in out.items()}


def params_from_open_clip(state_dict, text_config: CLIPTextConfig,
                          vision_config: CLIPVisionConfig,
                          dtype=jnp.float32) -> dict:
    """Convert openai-CLIP / open_clip state-dict naming
    (visual.transformer.resblocks.*, in_proj_weight fused QKV)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}

    def blocks(prefix, L, H):
        return convert_open_clip_resblocks(sd, prefix, L, dtype)

    conv = sd["visual.conv1.weight"]  # (H, 3, p, p)
    H = conv.shape[0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, H)

    params = {
        "text": {
            "token_embedding": jnp.asarray(sd["token_embedding.weight"], dtype),
            "position_embedding": jnp.asarray(sd["positional_embedding"], dtype),
            "layers": blocks("transformer.resblocks",
                             text_config.num_layers,
                             text_config.hidden_size),
            "final_ln_scale": jnp.asarray(sd["ln_final.weight"], dtype),
            "final_ln_bias": jnp.asarray(sd["ln_final.bias"], dtype),
            "text_projection": jnp.asarray(sd["text_projection"], dtype),
        },
        "vision": {
            "patch_embedding": jnp.asarray(patch_w, dtype),
            "class_embedding": jnp.asarray(sd["visual.class_embedding"], dtype),
            "position_embedding": jnp.asarray(
                sd["visual.positional_embedding"], dtype),
            "pre_ln_scale": jnp.asarray(sd["visual.ln_pre.weight"], dtype),
            "pre_ln_bias": jnp.asarray(sd["visual.ln_pre.bias"], dtype),
            "layers": blocks("visual.transformer.resblocks",
                             vision_config.num_layers,
                             vision_config.hidden_size),
            "post_ln_scale": jnp.asarray(sd["visual.ln_post.weight"], dtype),
            "post_ln_bias": jnp.asarray(sd["visual.ln_post.bias"], dtype),
            "visual_projection": jnp.asarray(sd["visual.proj"], dtype),
        },
    }
    return params


# --- model wrapper -------------------------------------------------------------

# registry name → HF hub repo for the openai CLIP family
_OPENAI_HF_REPOS = {
    "ViT-B/32": "openai/clip-vit-base-patch32",
    "ViT-B/16": "openai/clip-vit-base-patch16",
    "ViT-L/14": "openai/clip-vit-large-patch14",
    "ViT-L/14@336px": "openai/clip-vit-large-patch14-336",
}


class JaxCLIPModel:
    """CLIP wrapper with text + image encode (reference CLIP class,
    clip_utils.py:295; open_clip class, open_clip_model.py:28)."""

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
        self.vision_config: Optional[CLIPVisionConfig] = None
        self.tokenizer = None
        self._param_bytes = 0
        platform = "cpu" if device == Device.CPU else None
        try:
            self._jdevice = (jax.devices(platform)[0] if platform
                             else jax.devices()[0])
        except RuntimeError:
            self._jdevice = jax.devices()[0]
        # multi-chip serving: params replicate over the mesh, encode
        # batches shard across dp (parallel/serving.py; VERDICT r2 item 2)
        from marqo_tpu.parallel.serving import serving_mesh
        mesh = serving_mesh()
        self._mesh = (mesh if mesh is not None and
                      any(d == self._jdevice for d in mesh.devices.flat)
                      else None)

    def _place_params(self, params):
        if self._mesh is not None:
            from marqo_tpu.parallel.serving import place_params
            return place_params(params, self._mesh)
        return jax.device_put(params, self._jdevice)

    def _put(self, arr):
        return _model_put(self, arr)

    @property
    def dimensions(self) -> int:
        return int(self.properties.get("dimensions", 0)) or \
            (self.text_config.projection_dim if self.text_config else 0)

    def load(self) -> None:
        if self.properties.get("localpath"):
            self._load_from_hf_dir(self.properties["localpath"])
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            repo = _OPENAI_HF_REPOS.get(
                self.model_name, self.properties.get("name", self.model_name))
            try:
                self._load_from_hf_dir(repo)
            except Exception as e:
                raise ModelLoadError(
                    f"Could not load CLIP model `{self.model_name}` from "
                    f"`{repo}`: {e}. If running offline, provide "
                    f"model_properties.localpath.", cause=e)
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_hf_dir(self, repo_or_path: str) -> None:
        from transformers import CLIPConfig, CLIPModel, CLIPTokenizerFast
        hf_config = CLIPConfig.from_pretrained(repo_or_path)
        self.text_config = CLIPTextConfig(
            vocab_size=hf_config.text_config.vocab_size,
            hidden_size=hf_config.text_config.hidden_size,
            num_layers=hf_config.text_config.num_hidden_layers,
            num_heads=hf_config.text_config.num_attention_heads,
            intermediate_size=hf_config.text_config.intermediate_size,
            max_positions=hf_config.text_config.max_position_embeddings,
            projection_dim=hf_config.projection_dim,
            hidden_act=hf_config.text_config.hidden_act,
            eos_token_id=hf_config.text_config.eos_token_id,
        )
        self.vision_config = CLIPVisionConfig(
            image_size=hf_config.vision_config.image_size,
            patch_size=hf_config.vision_config.patch_size,
            hidden_size=hf_config.vision_config.hidden_size,
            num_layers=hf_config.vision_config.num_hidden_layers,
            num_heads=hf_config.vision_config.num_attention_heads,
            intermediate_size=hf_config.vision_config.intermediate_size,
            projection_dim=hf_config.projection_dim,
            hidden_act=hf_config.vision_config.hidden_act,
        )
        torch_model = CLIPModel.from_pretrained(repo_or_path)
        self.params = self._place_params(
            params_from_hf_clip(torch_model.state_dict(), self.text_config,
                                self.vision_config, dtype=self.compute_dtype))
        del torch_model
        self.tokenizer = CLIPTokenizerFast.from_pretrained(repo_or_path)

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        proj = int(self.properties.get("dimensions", 512))
        self.text_config = CLIPTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=int(arch.get("text_hidden_size", 64)),
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 128)),
            projection_dim=proj,
            eos_token_id=int(arch.get("vocab_size", 1024)) - 1,
        )
        self.vision_config = CLIPVisionConfig(
            image_size=int(self.properties.get("image_size", 224)),
            patch_size=int(arch.get("patch_size", 32)),
            hidden_size=int(arch.get("vision_hidden_size", 64)),
            num_layers=int(arch.get("vision_layers", 2)),
            num_heads=int(arch.get("vision_heads", 2)),
            intermediate_size=int(arch.get("vision_intermediate", 128)),
            projection_dim=proj,
        )
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        self.params = self._place_params(
            init_clip_params(self.text_config, self.vision_config,
                             jax.random.PRNGKey(seed),
                             dtype=self.compute_dtype))
        from marqo_tpu.models.tokenizer import TextTokenizer
        self.tokenizer = TextTokenizer.build_test_wordpiece(
            max_length=self.text_config.max_positions)

    # -- encoding ------------------------------------------------------------

    def _tokenize(self, texts: List[str]) -> np.ndarray:
        max_len = self.text_config.max_positions
        from marqo_tpu.models.tokenizer import TextTokenizer
        if isinstance(self.tokenizer, TextTokenizer):
            batch = self.tokenizer.encode_batch(texts, pad_to=max_len)
            ids = batch["input_ids"] % self.text_config.vocab_size
            # mark EOS at the end of each sequence for pooling
            for i, L in enumerate(batch["lengths"]):
                ids[i, min(L, max_len) - 1] = self.text_config.eos_token_id
            return ids.astype(np.int32)
        enc = self.tokenizer(texts, padding="max_length", truncation=True,
                             max_length=max_len, return_tensors="np")
        return enc["input_ids"].astype(np.int32)

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
        from marqo_tpu.parallel.serving import round_up_to_dp
        ids = self._tokenize(texts)
        n = len(texts)
        bucket = round_up_to_dp(pick_batch_bucket(n),
                                getattr(self, "_mesh", None))
        outs = []
        start = 0
        while start < n:
            size = min(bucket, n - start)
            padded = np.zeros((bucket, ids.shape[1]), dtype=np.int32)
            padded[:size] = ids[start:start + size]
            padded[size:, -1] = self.text_config.eos_token_id
            emb = encode_clip_text_jit(
                self.params, _model_put(self, padded),
                self.text_config, compute_dtype=self.compute_dtype)
            outs.append(np.asarray(emb)[:size])
            start += size
        return np.concatenate(outs, axis=0)

    def _preprocess_host(self, content) -> np.ndarray:
        """decode → EXIF → shorter-side bicubic resize → center crop, all in
        uint8 on host (exact torchvision/PIL parity); returns
        (size, size, 3) uint8."""
        from PIL import Image
        size = self.vision_config.image_size
        arr = host_decode(content)
        img = Image.fromarray(arr)
        w, h = img.size
        if w <= h:
            new_w, new_h = size, max(1, int(round(h * size / w)))
        else:
            new_w, new_h = max(1, int(round(w * size / h))), size
        img = img.resize((new_w, new_h), Image.BICUBIC)
        left = (new_w - size) // 2
        top = (new_h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        return np.asarray(img, dtype=np.uint8)

    def _encode_images(self, contents: List[Any]) -> np.ndarray:
        from marqo_tpu.parallel.serving import round_up_to_dp
        pixels = np.stack([self._preprocess_host(c) for c in contents])
        n = len(contents)
        bucket = round_up_to_dp(pick_batch_bucket(n),
                                getattr(self, "_mesh", None))
        outs = []
        start = 0
        while start < n:
            size = min(bucket, n - start)
            padded = np.zeros((bucket,) + pixels.shape[1:], dtype=np.uint8)
            padded[:size] = pixels[start:start + size]
            emb = encode_clip_image_jit(
                self.params, _model_put(self, padded),
                self.vision_config, compute_dtype=self.compute_dtype)
            outs.append(np.asarray(emb)[:size])
            start += size
        return np.concatenate(outs, axis=0)

    def memory_bytes(self) -> int:
        return self._param_bytes
