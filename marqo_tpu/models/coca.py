"""CoCa (Contrastive Captioner) in pure functional JAX.

The reference serves open_clip CoCa checkpoints (`coca_ViT-B-32`,
`coca_ViT-L-14`; model_registry.py open_clip section) through its OPEN_CLIP
wrapper (core/inference/embedding_models/open_clip_model.py:28) — for
embeddings it calls encode_text/encode_image only, but the checkpoint (and
the architecture) carries a third tower, the multimodal text decoder, used
for caption generation. This module implements all three towers so the
full open_clip CoCa state dict converts:

  - Text tower: causal transformer with a learned CLS embedding appended
    at the END of the sequence (open_clip TextTransformer embed_cls=True):
    the CLS row attends every non-pad position; pooling takes the CLS
    output, applies ln_final AFTER pooling, then projects.
  - Vision tower: standard pre-LN ViT, then an attentional pooler
    (n_queries learned queries cross-attend the patch grid, mapping vision
    width → embed dim), ln_post, contrastive embedding = query 0 @ proj;
    queries 1.. are the caption tokens fed to the decoder.
  - Multimodal decoder: per layer, causal self-attention over text tokens
    followed by cross-attention onto the pooled image tokens; ln_final and
    a projection to vocab logits (open_clip MultimodalTransformer).

All towers run as scan-stacked layer pytrees (compile once per depth),
bf16 compute / fp32 statistics like the rest of the model zoo.
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


@dataclass(frozen=True)
class CoCaTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    context_length: int = 76      # CLS appended → 77 positions
    embed_dim: int = 512          # contrastive latent
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    pad_id: int = 0


@dataclass(frozen=True)
class CoCaVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    embed_dim: int = 512          # attn-pool output dim == contrastive dim
    n_queries: int = 256          # attentional pooler queries
    pooler_heads: int = 8
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class CoCaDecoderConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    context_length: int = 76
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5


# --- building blocks ---------------------------------------------------------

def _attention(q, k, v, num_heads: int, bias: Optional[jax.Array] = None):
    """Multi-head attention over (B, Sq, H) queries and (B, Sk, H) keys.
    q/k/v are already projected. bias is an additive (B, Sq, Sk) mask."""
    B, Sq, H = q.shape
    Sk = k.shape[1]
    D = H // num_heads
    qh = q.reshape(B, Sq, num_heads, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Sk, num_heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Sk, num_heads, D).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(D, jnp.float32))
    if bias is not None:
        scores = scores + bias[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, H)


def _self_block(x, lp, num_heads, act_name, eps, bias):
    """Pre-LN residual block: self-attention + MLP (open_clip
    ResidualAttentionBlock)."""
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
    q = jnp.einsum("bsh,hd->bsd", h, lp["q_w"]) + lp["q_b"]
    k = jnp.einsum("bsh,hd->bsd", h, lp["k_w"]) + lp["k_b"]
    v = jnp.einsum("bsh,hd->bsd", h, lp["v_w"]) + lp["v_b"]
    a = _attention(q, k, v, num_heads, bias)
    x = x + (jnp.einsum("bsh,hd->bsd", a, lp["o_w"]) + lp["o_b"])
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    h = ACTIVATIONS[act_name](
        jnp.einsum("bsh,hi->bsi", h, lp["mlp_w1"]) + lp["mlp_b1"])
    return x + (jnp.einsum("bsi,ih->bsh", h, lp["mlp_w2"]) + lp["mlp_b2"])


def _cross_block(x, kv, lp, num_heads, act_name, eps):
    """Pre-LN residual cross-attention block (open_clip
    ResidualAttentionBlock(is_cross_attention=True): ln_1 on queries,
    ln_1_kv on the image tokens)."""
    hq = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
    hk = layer_norm(kv, lp["ln1kv_scale"], lp["ln1kv_bias"], eps)
    q = jnp.einsum("bsh,hd->bsd", hq, lp["q_w"]) + lp["q_b"]
    k = jnp.einsum("bsh,hd->bsd", hk, lp["k_w"]) + lp["k_b"]
    v = jnp.einsum("bsh,hd->bsd", hk, lp["v_w"]) + lp["v_b"]
    a = _attention(q, k, v, num_heads)
    x = x + (jnp.einsum("bsh,hd->bsd", a, lp["o_w"]) + lp["o_b"])
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
    h = ACTIVATIONS[act_name](
        jnp.einsum("bsh,hi->bsi", h, lp["mlp_w1"]) + lp["mlp_b1"])
    return x + (jnp.einsum("bsi,ih->bsh", h, lp["mlp_w2"]) + lp["mlp_b2"])


# --- text tower ---------------------------------------------------------------

def encode_coca_text(params: dict, input_ids: jax.Array,
                     config: CoCaTextConfig,
                     compute_dtype=jnp.bfloat16,
                     return_tokens: bool = False):
    """(B, S≤context_length) int32 → (B, embed_dim) fp32 (unnormalized).

    Mirrors open_clip TextTransformer.forward with cls_emb: CLS appended at
    the end, causal mask + a CLS row that attends all non-pad positions,
    pooled = ln_final(x[:, -1]) @ text_projection. With return_tokens, also
    returns the per-token outputs (caption-side decoder input)."""
    p = params["text"]
    B, S = input_ids.shape
    x = p["token_embedding"][input_ids]
    cls = jnp.broadcast_to(p["cls_emb"], (B, 1, config.hidden_size))
    x = jnp.concatenate([x, cls], axis=1)          # (B, S+1, H)
    x = x + p["position_embedding"][:S + 1][None]
    x = x.astype(compute_dtype)

    # additive mask: causal everywhere; the CLS (last) row masks padding.
    # open_clip build_cls_mask LEFT-pads the non-pad pattern by one (key 0
    # always attendable, key j gated by non_pad[j-1]) — replicated exactly,
    # since the pretrained weights saw this mask.
    T = S + 1
    causal = jnp.where(
        jnp.arange(T)[:, None] >= jnp.arange(T)[None, :], 0.0, -jnp.inf)
    non_pad = (input_ids != config.pad_id)
    cls_row = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.where(non_pad, 0.0, -jnp.inf)], axis=1)  # (B, S+1)
    bias = jnp.broadcast_to(causal[None], (B, T, T))
    bias = bias.at[:, -1, :].set(cls_row)

    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])

    def body(carry, lp):
        return _self_block(carry, lp, config.num_heads, config.hidden_act,
                           config.layer_norm_eps, bias), None

    x, _ = jax.lax.scan(body, x, layers)
    pooled = layer_norm(x[:, -1, :].astype(jnp.float32),
                        p["final_ln_scale"], p["final_ln_bias"],
                        config.layer_norm_eps)
    latent = pooled @ p["text_projection"].astype(jnp.float32)
    if return_tokens:
        return latent, x[:, :-1, :]
    return latent


# --- vision tower --------------------------------------------------------------

def _attentional_pool(x, p, n_heads: int, eps: float):
    """open_clip AttentionalPooler: learned queries cross-attend the patch
    sequence; kdim (vision width) ≠ d_model (embed dim)."""
    xk = layer_norm(x, p["ln_k_scale"], p["ln_k_bias"], eps)
    q0 = layer_norm(p["query"], p["ln_q_scale"], p["ln_q_bias"], eps)
    B = x.shape[0]
    q = jnp.broadcast_to(q0[None], (B,) + q0.shape).astype(x.dtype)
    qp = jnp.einsum("bqd,de->bqe", q, p["q_w"]) + p["q_b"]
    kp = jnp.einsum("bsh,he->bse", xk, p["k_w"]) + p["k_b"]
    vp = jnp.einsum("bsh,he->bse", xk, p["v_w"]) + p["v_b"]
    a = _attention(qp, kp, vp, n_heads)
    return jnp.einsum("bqe,ed->bqd", a, p["o_w"]) + p["o_b"]


def encode_coca_image(params: dict, pixels_u8: jax.Array,
                      config: CoCaVisionConfig,
                      compute_dtype=jnp.bfloat16,
                      return_tokens: bool = False):
    """(B, size, size, 3) uint8 → (B, embed_dim) fp32 (unnormalized).

    ViT backbone → attentional pooler (n_queries) → ln_post; contrastive
    latent = query 0 @ proj, caption tokens = queries 1.. ."""
    from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

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
    x = jnp.einsum("bnp,ph->bnh", x, p["patch_embedding"].astype(compute_dtype))
    cls = jnp.broadcast_to(p["class_embedding"].astype(compute_dtype),
                           (B, 1, config.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(compute_dtype)[None]
    x = layer_norm(x, p["pre_ln_scale"], p["pre_ln_bias"],
                   config.layer_norm_eps).astype(compute_dtype)

    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])

    def body(carry, lp):
        return _self_block(carry, lp, config.num_heads, config.hidden_act,
                           config.layer_norm_eps, None), None

    x, _ = jax.lax.scan(body, x, layers)
    pooled = _attentional_pool(x, p["attn_pool"], config.pooler_heads,
                               config.layer_norm_eps)   # (B, nq, D)
    pooled = layer_norm(pooled.astype(jnp.float32),
                        p["post_ln_scale"], p["post_ln_bias"],
                        config.layer_norm_eps)
    latent = pooled[:, 0, :] @ p["proj"].astype(jnp.float32)
    if return_tokens:
        return latent, pooled[:, 1:, :]
    return latent


# --- multimodal decoder ---------------------------------------------------------

def coca_decode_logits(params: dict, token_embs: jax.Array,
                       image_tokens: jax.Array,
                       config: CoCaDecoderConfig,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """Caption logits (open_clip MultimodalTransformer.forward): per layer,
    causal self-attention over the text-tower token outputs, then
    cross-attention onto the pooled image tokens; ln_final → vocab proj.

    token_embs:   (B, S, H) text-tower per-token outputs (pre-ln_final)
    image_tokens: (B, nq-1, H) attn-pooled caption queries (post ln_post)
    → (B, S, vocab_size) fp32 logits
    """
    p = params["decoder"]
    B, S, H = token_embs.shape
    causal = jnp.where(
        jnp.arange(S)[:, None] >= jnp.arange(S)[None, :], 0.0, -jnp.inf)
    bias = jnp.broadcast_to(causal[None], (B, S, S))
    x = token_embs.astype(compute_dtype)
    kv = image_tokens.astype(compute_dtype)

    self_layers = jax.tree.map(lambda a: a.astype(compute_dtype),
                               p["self_layers"])
    cross_layers = jax.tree.map(lambda a: a.astype(compute_dtype),
                                p["cross_layers"])

    def body(carry, lp):
        sp, cp = lp
        h = _self_block(carry, sp, config.num_heads, config.hidden_act,
                        config.layer_norm_eps, bias)
        h = _cross_block(h, kv, cp, config.num_heads, config.hidden_act,
                         config.layer_norm_eps)
        return h, None

    x, _ = jax.lax.scan(body, x, (self_layers, cross_layers))
    x = layer_norm(x.astype(jnp.float32), p["final_ln_scale"],
                   p["final_ln_bias"], config.layer_norm_eps)
    return x @ p["vocab_projection"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_coca_text_jit(params, input_ids, config,
                         compute_dtype=jnp.bfloat16):
    return encode_coca_text(params, input_ids, config, compute_dtype)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_coca_image_jit(params, pixels_u8, config,
                          compute_dtype=jnp.bfloat16):
    return encode_coca_image(params, pixels_u8, config, compute_dtype)


# --- init ----------------------------------------------------------------------

def _init_self_blocks(rng, L, H, I, dtype):
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


def _init_cross_blocks(rng, L, H, I, dtype):
    blocks = _init_self_blocks(rng, L, H, I, dtype)
    blocks["ln1kv_scale"] = jnp.ones((L, H), dtype)
    blocks["ln1kv_bias"] = jnp.zeros((L, H), dtype)
    return blocks


def init_coca_params(text_config: CoCaTextConfig,
                     vision_config: CoCaVisionConfig,
                     decoder_config: CoCaDecoderConfig, rng,
                     dtype=jnp.float32) -> dict:
    kt, kv, kd, k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 9)
    std = 0.02
    Ht = text_config.hidden_size
    Hv = vision_config.hidden_size
    D = vision_config.embed_dim
    n_patches = (vision_config.image_size // vision_config.patch_size) ** 2

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    return {
        "text": {
            "token_embedding": norm(k1, (text_config.vocab_size, Ht)),
            "position_embedding": norm(
                k2, (text_config.context_length + 1, Ht)),
            "cls_emb": norm(jax.random.fold_in(kt, 1), (Ht,)),
            "layers": _init_self_blocks(kt, text_config.num_layers, Ht,
                                        text_config.intermediate_size, dtype),
            "final_ln_scale": jnp.ones((Ht,), dtype),
            "final_ln_bias": jnp.zeros((Ht,), dtype),
            "text_projection": norm(k3, (Ht, text_config.embed_dim)),
        },
        "vision": {
            "patch_embedding": norm(
                k4, (vision_config.patch_size ** 2 * 3, Hv)),
            "class_embedding": norm(jax.random.fold_in(kv, 1), (Hv,)),
            "position_embedding": norm(
                jax.random.fold_in(kv, 2), (n_patches + 1, Hv)),
            "pre_ln_scale": jnp.ones((Hv,), dtype),
            "pre_ln_bias": jnp.zeros((Hv,), dtype),
            "layers": _init_self_blocks(kv, vision_config.num_layers, Hv,
                                        vision_config.intermediate_size,
                                        dtype),
            "attn_pool": {
                "query": norm(k5, (vision_config.n_queries, D)),
                "ln_q_scale": jnp.ones((D,), dtype),
                "ln_q_bias": jnp.zeros((D,), dtype),
                "ln_k_scale": jnp.ones((Hv,), dtype),
                "ln_k_bias": jnp.zeros((Hv,), dtype),
                "q_w": norm(jax.random.fold_in(kv, 3), (D, D)),
                "q_b": jnp.zeros((D,), dtype),
                "k_w": norm(jax.random.fold_in(kv, 4), (Hv, D)),
                "k_b": jnp.zeros((D,), dtype),
                "v_w": norm(jax.random.fold_in(kv, 5), (Hv, D)),
                "v_b": jnp.zeros((D,), dtype),
                "o_w": norm(jax.random.fold_in(kv, 6), (D, D)),
                "o_b": jnp.zeros((D,), dtype),
            },
            "post_ln_scale": jnp.ones((D,), dtype),
            "post_ln_bias": jnp.zeros((D,), dtype),
            "proj": norm(k6, (D, D)),
        },
        "decoder": {
            "self_layers": _init_self_blocks(
                kd, decoder_config.num_layers, decoder_config.hidden_size,
                decoder_config.intermediate_size, dtype),
            "cross_layers": _init_cross_blocks(
                jax.random.fold_in(kd, 1), decoder_config.num_layers,
                decoder_config.hidden_size,
                decoder_config.intermediate_size, dtype),
            "final_ln_scale": jnp.ones((decoder_config.hidden_size,), dtype),
            "final_ln_bias": jnp.zeros((decoder_config.hidden_size,), dtype),
            "vocab_projection": norm(
                jax.random.fold_in(kd, 2),
                (decoder_config.hidden_size, decoder_config.vocab_size)),
        },
    }


# --- open_clip checkpoint conversion --------------------------------------------

def params_from_open_clip_coca(state_dict,
                               text_config: CoCaTextConfig,
                               vision_config: CoCaVisionConfig,
                               decoder_config: CoCaDecoderConfig,
                               dtype=jnp.float32) -> dict:
    """Convert an open_clip CoCa state dict (coca_model.py naming:
    text.*, visual.* incl. visual.attn_pool.*, text_decoder.*)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}

    def self_blocks(prefix, L):
        from marqo_tpu.models.clip import convert_open_clip_resblocks
        return convert_open_clip_resblocks(sd, prefix, L, dtype)

    def cross_blocks(prefix, L):
        out = self_blocks(prefix, L)
        kv_scale, kv_bias = [], []
        for i in range(L):
            kv_scale.append(sd[f"{prefix}.{i}.ln_1_kv.weight"])
            kv_bias.append(sd[f"{prefix}.{i}.ln_1_kv.bias"])
        out["ln1kv_scale"] = jnp.asarray(np.stack(kv_scale), dtype)
        out["ln1kv_bias"] = jnp.asarray(np.stack(kv_bias), dtype)
        return out

    conv = sd["visual.conv1.weight"]  # (Hv, 3, p, p)
    Hv = conv.shape[0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, Hv)

    # AttentionalPooler with kdim≠embed_dim stores separate q/k/v weights
    pool = "visual.attn_pool"
    in_b = sd[f"{pool}.attn.in_proj_bias"]
    qb, kb, vb = np.split(in_b, 3, axis=0)

    return {
        "text": {
            "token_embedding": jnp.asarray(
                sd["text.token_embedding.weight"], dtype),
            "position_embedding": jnp.asarray(
                sd["text.positional_embedding"], dtype),
            "cls_emb": jnp.asarray(sd["text.cls_emb"].reshape(-1), dtype),
            "layers": self_blocks("text.transformer.resblocks",
                                  text_config.num_layers),
            "final_ln_scale": jnp.asarray(sd["text.ln_final.weight"], dtype),
            "final_ln_bias": jnp.asarray(sd["text.ln_final.bias"], dtype),
            "text_projection": jnp.asarray(sd["text.text_projection"], dtype),
        },
        "vision": {
            "patch_embedding": jnp.asarray(patch_w, dtype),
            "class_embedding": jnp.asarray(sd["visual.class_embedding"],
                                           dtype),
            "position_embedding": jnp.asarray(
                sd["visual.positional_embedding"], dtype),
            "pre_ln_scale": jnp.asarray(sd["visual.ln_pre.weight"], dtype),
            "pre_ln_bias": jnp.asarray(sd["visual.ln_pre.bias"], dtype),
            "layers": self_blocks("visual.transformer.resblocks",
                                  vision_config.num_layers),
            "attn_pool": {
                "query": jnp.asarray(sd[f"{pool}.query"], dtype),
                "ln_q_scale": jnp.asarray(sd[f"{pool}.ln_q.weight"], dtype),
                "ln_q_bias": jnp.asarray(sd[f"{pool}.ln_q.bias"], dtype),
                "ln_k_scale": jnp.asarray(sd[f"{pool}.ln_k.weight"], dtype),
                "ln_k_bias": jnp.asarray(sd[f"{pool}.ln_k.bias"], dtype),
                "q_w": jnp.asarray(sd[f"{pool}.attn.q_proj_weight"].T, dtype),
                "q_b": jnp.asarray(qb, dtype),
                "k_w": jnp.asarray(sd[f"{pool}.attn.k_proj_weight"].T, dtype),
                "k_b": jnp.asarray(kb, dtype),
                "v_w": jnp.asarray(sd[f"{pool}.attn.v_proj_weight"].T, dtype),
                "v_b": jnp.asarray(vb, dtype),
                "o_w": jnp.asarray(sd[f"{pool}.attn.out_proj.weight"].T,
                                   dtype),
                "o_b": jnp.asarray(sd[f"{pool}.attn.out_proj.bias"], dtype),
            },
            "post_ln_scale": jnp.asarray(sd["visual.ln_post.weight"], dtype),
            "post_ln_bias": jnp.asarray(sd["visual.ln_post.bias"], dtype),
            "proj": jnp.asarray(sd["visual.proj"], dtype),
        },
        "decoder": {
            "self_layers": self_blocks("text_decoder.resblocks",
                                       decoder_config.num_layers),
            "cross_layers": cross_blocks("text_decoder.cross_attn",
                                         decoder_config.num_layers),
            "final_ln_scale": jnp.asarray(
                sd["text_decoder.ln_final.weight"], dtype),
            "final_ln_bias": jnp.asarray(
                sd["text_decoder.ln_final.bias"], dtype),
            "vocab_projection": jnp.asarray(
                sd["text_decoder.text_projection"], dtype),
        },
    }


# --- model wrapper ---------------------------------------------------------------

def coca_vit_b32_configs(embed_dim: int = 512):
    """open_clip coca_ViT-B-32 model config (open_clip
    model_configs/coca_ViT-B-32.json)."""
    text = CoCaTextConfig(embed_dim=embed_dim)
    vision = CoCaVisionConfig(embed_dim=embed_dim)
    dec = CoCaDecoderConfig()
    return text, vision, dec


def coca_vit_l14_configs(embed_dim: int = 768):
    """open_clip coca_ViT-L-14 model config."""
    text = CoCaTextConfig(hidden_size=768, num_heads=12,
                          intermediate_size=3072, embed_dim=embed_dim)
    vision = CoCaVisionConfig(patch_size=14, hidden_size=1024,
                              num_layers=24, num_heads=16,
                              intermediate_size=4096, embed_dim=embed_dim)
    dec = CoCaDecoderConfig(hidden_size=768, num_heads=12,
                            intermediate_size=3072)
    return text, vision, dec


class JaxCoCaModel:
    """CoCa wrapper: text + image embedding via the contrastive latents
    (what the reference's OPEN_CLIP.encode does for coca_* names) plus the
    caption-decoder forward for checkpoint completeness."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth=None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.params = None
        self.text_config: Optional[CoCaTextConfig] = None
        self.vision_config: Optional[CoCaVisionConfig] = None
        self.decoder_config: Optional[CoCaDecoderConfig] = None
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
        dims = int(self.properties.get("dimensions", 512))
        if "ViT-L-14" in name:
            return coca_vit_l14_configs(dims)
        return coca_vit_b32_configs(dims)

    def load(self) -> None:
        if self.properties.get("localpath"):
            self._load_from_checkpoint(self.properties["localpath"])
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            raise ModelLoadError(
                f"CoCa model `{self.model_name}` requires an open_clip "
                "checkpoint: provide model_properties.localpath (a .pt/.bin "
                "state dict or directory) or a model_location. The "
                "architecture itself runs natively in JAX.")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_checkpoint(self, path: str) -> None:
        import os

        import torch
        self.text_config, self.vision_config, self.decoder_config = \
            self._configs_for_name()
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
            params_from_open_clip_coca(state, self.text_config,
                                       self.vision_config,
                                       self.decoder_config,
                                       dtype=self.compute_dtype))
        self._init_tokenizer(checkpoint=path)

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        dims = int(self.properties.get("dimensions", 64))
        # open_clip CoCa ties embed_dim == text width == decoder width (the
        # attn-pooled image tokens feed the decoder cross-attention raw)
        self.text_config = CoCaTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=int(arch.get("text_hidden_size", dims)),
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 128)),
            context_length=int(arch.get("context_length", 76)),
            embed_dim=dims)
        self.vision_config = CoCaVisionConfig(
            image_size=int(self.properties.get("image_size", 224)),
            patch_size=int(arch.get("patch_size", 32)),
            hidden_size=int(arch.get("vision_hidden_size", 64)),
            num_layers=int(arch.get("vision_layers", 2)),
            num_heads=int(arch.get("vision_heads", 2)),
            intermediate_size=int(arch.get("vision_intermediate", 128)),
            embed_dim=dims,
            n_queries=int(arch.get("n_queries", 16)),
            pooler_heads=int(arch.get("pooler_heads", 2)))
        self.decoder_config = CoCaDecoderConfig(
            vocab_size=self.text_config.vocab_size,
            hidden_size=self.text_config.hidden_size,
            num_layers=int(arch.get("decoder_layers", 2)),
            num_heads=self.text_config.num_heads,
            intermediate_size=self.text_config.intermediate_size,
            context_length=self.text_config.context_length)
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        self.params = put_params(self, 
            init_coca_params(self.text_config, self.vision_config,
                             self.decoder_config, jax.random.PRNGKey(seed),
                             dtype=self.compute_dtype))
        self._init_tokenizer()

    def _init_tokenizer(self, checkpoint: str = None) -> None:
        from marqo_tpu.models.tokenizer import resolve_model_tokenizer
        self.tokenizer = resolve_model_tokenizer(
            self.properties, max_length=self.text_config.context_length,
            checkpoint_path=checkpoint,
            allow_test=bool(self.properties.get("random_init")))

    # -- encoding -------------------------------------------------------------

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
        batch = self.tokenizer.encode_batch(
            texts, pad_to=self.text_config.context_length)
        ids = (batch["input_ids"] % self.text_config.vocab_size).astype(
            np.int32)
        from marqo_tpu.inference.batching import batched_device_encode
        return batched_device_encode(ids, lambda padded: encode_coca_text_jit(
            self.params, _model_put(self, padded),
            self.text_config, compute_dtype=self.compute_dtype))

    def _encode_images(self, contents: List[Any]) -> np.ndarray:
        from marqo_tpu.models.clip import JaxCLIPModel
        pixels = np.stack([
            JaxCLIPModel._preprocess_host(self, c) for c in contents])
        from marqo_tpu.inference.batching import batched_device_encode
        return batched_device_encode(
            pixels, lambda padded: encode_coca_image_jit(
                self.params,
                _model_put(self, padded),
                self.vision_config, compute_dtype=self.compute_dtype))

    def caption_logits(self, texts: List[str], images: List[Any]) -> np.ndarray:
        """Teacher-forced caption logits for (text, image) pairs — the
        decoder forward that makes the third tower loadable/testable."""
        batch = self.tokenizer.encode_batch(
            texts, pad_to=self.text_config.context_length)
        ids = (batch["input_ids"] % self.text_config.vocab_size).astype(
            np.int32)
        from marqo_tpu.models.clip import JaxCLIPModel
        pixels = np.stack([
            JaxCLIPModel._preprocess_host(self, c) for c in images])
        _, token_embs = encode_coca_text(
            self.params, jnp.asarray(ids), self.text_config,
            compute_dtype=self.compute_dtype, return_tokens=True)
        _, image_tokens = encode_coca_image(
            self.params, jnp.asarray(pixels), self.vision_config,
            compute_dtype=self.compute_dtype, return_tokens=True)
        logits = coca_decode_logits(
            self.params, token_embs, image_tokens, self.decoder_config,
            compute_dtype=self.compute_dtype)
        return np.asarray(logits)

    def generate_caption_ids(self, images: List[Any], max_len: int = 16,
                             sot_id: int = 1,
                             eos_id: Optional[int] = None) -> List[List[int]]:
        """Greedy caption decoding (open_clip CoCa.generate with
        generation_type='top_k', k=1): start from <sot>, feed the growing
        prefix through the text tower + multimodal decoder, take the
        argmax next token, stop at <eos> or max_len. Host-side loop (one
        compile per prefix length) — adequate for the captioning surface;
        serving-scale generation would move the loop into lax.scan."""
        from marqo_tpu.models.clip import JaxCLIPModel
        pixels = np.stack([
            JaxCLIPModel._preprocess_host(self, c) for c in images])
        _, image_tokens = encode_coca_image(
            self.params, jnp.asarray(pixels), self.vision_config,
            compute_dtype=self.compute_dtype, return_tokens=True)
        B = len(images)
        seqs = [[sot_id] for _ in range(B)]
        finished = [False] * B
        for _ in range(max_len - 1):
            ids = np.asarray(seqs, dtype=np.int32)
            _, token_embs = encode_coca_text(
                self.params, jnp.asarray(ids), self.text_config,
                compute_dtype=self.compute_dtype, return_tokens=True)
            logits = coca_decode_logits(
                self.params, token_embs, image_tokens, self.decoder_config,
                compute_dtype=self.compute_dtype)
            next_ids = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
            for b in range(B):
                tok = int(next_ids[b])
                if finished[b]:
                    tok = eos_id if eos_id is not None else tok
                seqs[b].append(tok)
                if eos_id is not None and tok == eos_id:
                    finished[b] = True
            if eos_id is not None and all(finished):
                break
            if ids.shape[1] + 1 >= self.text_config.context_length:
                break
        return seqs

    def memory_bytes(self) -> int:
        return self._param_bytes
