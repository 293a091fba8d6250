"""OWL-ViT open-vocabulary detector in functional JAX — the image
reranker's scoring model.

Parity: the reference reranks image results with OWL-ViT
(s2_inference/reranking/rerank.py:12-54 dispatches on 'owl' in the model
name; cross_encoders.py:341-461 ReRankerOwl runs
google/owlvit-{base,large} per hit, keeps the top-k boxes per image, and
overwrites ``_score``/``_highlights`` with the best box score and its
rescaled bbox).

Architecture (matches transformers OwlViTForObjectDetection):
  - CLIP text tower (causal, EOS-pooled, text_projection) → query embeds
  - CLIP vision tower; post-LN over ALL tokens, patch tokens multiplied by
    the class token, then a merge LayerNorm → per-patch features
  - class head: dense0 → cosine logits vs query embeds, scaled by
    (elu(scale(feats)) + 1) and shifted by shift(feats)
  - box head: 3-layer gelu MLP + grid logit bias → sigmoid cxcywh boxes

TPU shape: towers reuse models/clip.py's scanned pre-LN blocks; one jit
per (batch, queries) bucket; all per-patch heads are dense matmuls (MXU).
Random-init parity vs transformers' torch OwlViT is tested like the other
families; real weights load from a local HF checkpoint directory.
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                   _run_blocks, encode_clip_text,
                                   params_from_hf_clip)
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD
from marqo_tpu.ops.common import layer_norm


@dataclass(frozen=True)
class OwlViTConfig:
    text: CLIPTextConfig
    vision: CLIPVisionConfig

    @staticmethod
    def base_patch32() -> "OwlViTConfig":
        # google/owlvit-base-patch32: 768px images, 24x24 patch grid
        return OwlViTConfig(
            text=CLIPTextConfig(vocab_size=49408, hidden_size=512,
                                num_layers=12, num_heads=8,
                                intermediate_size=2048, max_positions=16,
                                projection_dim=512),
            vision=CLIPVisionConfig(image_size=768, patch_size=32,
                                    hidden_size=768, num_layers=12,
                                    num_heads=12, intermediate_size=3072,
                                    projection_dim=512))


def init_owl_params(config: OwlViTConfig, rng, dtype=jnp.float32) -> dict:
    from marqo_tpu.models.clip import init_clip_params
    k0, k1, k2, k3, k4 = jax.random.split(rng, 5)
    params = init_clip_params(config.text, config.vision, k0, dtype=dtype)
    Hv = config.vision.hidden_size
    P = config.text.projection_dim
    std = 0.02

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    params["merge_ln_scale"] = jnp.ones((Hv,), dtype)
    params["merge_ln_bias"] = jnp.zeros((Hv,), dtype)
    params["class_head"] = {
        "dense0_w": norm(k1, (Hv, P)), "dense0_b": jnp.zeros((P,), dtype),
        "shift_w": norm(jax.random.fold_in(k2, 0), (Hv, 1)),
        "shift_b": jnp.zeros((1,), dtype),
        "scale_w": norm(jax.random.fold_in(k2, 1), (Hv, 1)),
        "scale_b": jnp.zeros((1,), dtype),
    }
    params["box_head"] = {
        "w0": norm(k3, (Hv, Hv)), "b0": jnp.zeros((Hv,), dtype),
        "w1": norm(jax.random.fold_in(k3, 1), (Hv, Hv)),
        "b1": jnp.zeros((Hv,), dtype),
        "w2": norm(k4, (Hv, 4)), "b2": jnp.zeros((4,), dtype),
    }
    return params


def compute_box_bias(n_side: int) -> jnp.ndarray:
    """(P, 4) logit bias anchoring each patch's box to its grid cell
    (transformers OwlViT compute_box_bias / normalize_grid_corner_coords:
    centers at (i+1)/n with 1/n sizes, in logit space)."""
    coords = np.stack(np.meshgrid(np.arange(1, n_side + 1),
                                  np.arange(1, n_side + 1)),
                      axis=-1).astype(np.float32) / n_side
    coords = coords.reshape(-1, 2)
    coords = np.clip(coords, 0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    sizes = np.full_like(coords, 1.0 / n_side)
    size_bias = np.log(sizes + 1e-4) - np.log1p(-sizes + 1e-4)
    return jnp.asarray(np.concatenate([coord_bias, size_bias], axis=-1))


def _image_features(params: dict, pixels_u8: jax.Array,
                    config: CLIPVisionConfig, compute_dtype) -> jax.Array:
    """(B, size, size, 3) uint8 → (B, P, H) merged per-patch features."""
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
    cls = jnp.broadcast_to(p["class_embedding"].astype(compute_dtype),
                           (B, 1, config.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(compute_dtype)[None]
    if "pre_ln_scale" in p:
        x = layer_norm(x, p["pre_ln_scale"], p["pre_ln_bias"],
                       config.layer_norm_eps).astype(compute_dtype)
    n_tokens = x.shape[1]
    padded = -(-n_tokens // 8) * 8
    pad_mask = None
    if padded != n_tokens:
        x = jnp.pad(x, ((0, 0), (0, padded - n_tokens), (0, 0)))
        pad_mask = jnp.concatenate(
            [jnp.ones((B, n_tokens), jnp.int32),
             jnp.zeros((B, padded - n_tokens), jnp.int32)], axis=1)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), p["layers"])
    x = _run_blocks(x, layers, config.num_heads, config.hidden_act,
                    config.layer_norm_eps, causal=False, pad_mask=pad_mask)
    x = x[:, :n_tokens]
    # post-LN over ALL tokens, patch tokens gated by the class token, then
    # the merge LayerNorm (transformers OwlViTModel.image_embedder)
    x = layer_norm(x, p["post_ln_scale"], p["post_ln_bias"],
                   config.layer_norm_eps)
    class_token = x[:, :1, :]
    feats = x[:, 1:, :] * class_token
    feats = layer_norm(feats, params["merge_ln_scale"],
                       params["merge_ln_bias"], config.layer_norm_eps)
    return feats


def detect(params: dict, pixels_u8: jax.Array, input_ids: jax.Array,
           config: OwlViTConfig,
           compute_dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Returns (logits (B, P, Q) fp32, boxes (B, P, 4) cxcywh in [0,1]).

    transformers OwlViTForObjectDetection forward: class_predictor cosine
    logits with per-patch shift/scale; box_predictor MLP + grid bias."""
    vision = config.vision
    feats = _image_features(params, pixels_u8, vision, compute_dtype)
    feats32 = feats.astype(jnp.float32)

    # queries: (Q, proj) via the CLIP text tower, L2-normalized
    query = encode_clip_text(params, input_ids, config.text,
                             compute_dtype=compute_dtype)
    query = query / jnp.maximum(
        jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-6)

    ch = params["class_head"]
    class_embeds = feats32 @ ch["dense0_w"].astype(jnp.float32) + \
        ch["dense0_b"].astype(jnp.float32)
    class_embeds = class_embeds / jnp.maximum(
        jnp.linalg.norm(class_embeds, axis=-1, keepdims=True), 1e-6)
    logits = jnp.einsum("bpd,qd->bpq", class_embeds, query)
    shift = feats32 @ ch["shift_w"].astype(jnp.float32) + \
        ch["shift_b"].astype(jnp.float32)
    scale = feats32 @ ch["scale_w"].astype(jnp.float32) + \
        ch["scale_b"].astype(jnp.float32)
    scale = jax.nn.elu(scale) + 1.0
    logits = (logits + shift) * scale

    bh = params["box_head"]
    h = jax.nn.gelu(feats32 @ bh["w0"].astype(jnp.float32) +
                    bh["b0"].astype(jnp.float32), approximate=False)
    h = jax.nn.gelu(h @ bh["w1"].astype(jnp.float32) +
                    bh["b1"].astype(jnp.float32), approximate=False)
    raw = h @ bh["w2"].astype(jnp.float32) + bh["b2"].astype(jnp.float32)
    n_side = vision.image_size // vision.patch_size
    boxes = jax.nn.sigmoid(raw + compute_box_bias(n_side)[None])
    return logits, boxes


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def detect_jit(params, pixels_u8, input_ids, config,
               compute_dtype=jnp.bfloat16):
    return detect(params, pixels_u8, input_ids, config, compute_dtype)


def params_from_hf_owlvit(state_dict, config: OwlViTConfig,
                          dtype=jnp.float32) -> dict:
    """Convert a transformers OwlViTForObjectDetection state_dict."""
    sd = {}
    for key, value in state_dict.items():
        if key.startswith("owlvit."):
            key = key[len("owlvit."):]
        sd[key] = value
    params = params_from_hf_clip(sd, config.text, config.vision, dtype=dtype)

    def arr(name, transpose=False):
        a = sd[name]
        a = np.asarray(a.detach().cpu().numpy() if hasattr(a, "detach")
                       else a)
        return jnp.asarray(a.T if transpose else a, dtype)

    params["merge_ln_scale"] = arr("layer_norm.weight")
    params["merge_ln_bias"] = arr("layer_norm.bias")
    params["class_head"] = {
        "dense0_w": arr("class_head.dense0.weight", True),
        "dense0_b": arr("class_head.dense0.bias"),
        "shift_w": arr("class_head.logit_shift.weight", True),
        "shift_b": arr("class_head.logit_shift.bias"),
        "scale_w": arr("class_head.logit_scale.weight", True),
        "scale_b": arr("class_head.logit_scale.bias"),
    }
    params["box_head"] = {
        "w0": arr("box_head.dense0.weight", True),
        "b0": arr("box_head.dense0.bias"),
        "w1": arr("box_head.dense1.weight", True),
        "b1": arr("box_head.dense1.bias"),
        "w2": arr("box_head.dense2.weight", True),
        "b2": arr("box_head.dense2.bias"),
    }
    return params
