"""Stella text encoder (GTE-v1.5 "NewModel" backbone) in functional JAX.

Parity target: the reference loads `Marqo/dunzhang-stella_en_400M_v5` as
type `hf_stella` with trust_remote_code
(reference model_registry.py:898-904, 2144;
core/inference/embedding_models/hugging_face_stella_model.py:9-23 — an
HuggingFaceModel with remote-code flags, memory-efficient attention and
input unpadding disabled). The remote code is the Alibaba GTE-en-v1.5
"new" architecture, which differs from BERT in three ways:

  1. rotary position embeddings (RoPE) instead of learned absolute
     positions (no position-embedding table; rope_theta sets the base),
  2. a gated MLP: ``down(act(gate(x)) * up(x))`` with a packed
     ``up_gate_proj`` weight, instead of the 2-layer GELU MLP,
  3. packed ``qkv_proj`` attention weights.

It keeps BERT's post-LayerNorm residual layout. Stella adds a linear
projection head (``vector_linear``, the checkpoint's ``2_Dense_<dims>``
module) applied after mean pooling.

TPU design matches models/bert.py: stacked-layer pytrees reduced with one
``lax.scan``, bf16 compute with fp32 statistics, static bucketed shapes.
Real-weight loading requires the checkpoint on disk (no hub egress in this
environment); tests exercise architecture + conversion equivalence against
a random-init torch mirror, like the other model families.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.ops.common import (ACTIVATIONS, l2_normalize, layer_norm,
                                  masked_mean_pool)


@dataclass(frozen=True)
class StellaConfig:
    vocab_size: int = 30528
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 8192
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    rope_theta: float = 160000.0
    projection_dim: int = 1024  # vector_linear output width
    normalize: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def stella_400m_config(projection_dim: int = 1024) -> StellaConfig:
    """dunzhang/stella_en_400M_v5: GTE-large-en-v1.5 backbone (1024h/24L/
    16 heads/4096 ffn ≈ 434M params) + the requested projection head."""
    return StellaConfig(projection_dim=projection_dim)


def init_params(config: StellaConfig, rng: jax.Array,
                dtype=jnp.float32) -> dict:
    H, I, L = config.hidden_size, config.intermediate_size, config.num_layers
    P = config.projection_dim
    keys = iter(jax.random.split(rng, 12))
    std = 0.02

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    emb = {
        "word": norm(next(keys), (config.vocab_size, H)),
        "token_type": norm(next(keys), (config.type_vocab_size, H)),
        "ln_scale": jnp.ones((H,), dtype),
        "ln_bias": jnp.zeros((H,), dtype),
    }
    layers = {
        "qkv_w": norm(next(keys), (L, H, 3 * H)),
        "qkv_b": jnp.zeros((L, 3 * H), dtype),
        "o_w": norm(next(keys), (L, H, H)),
        "o_b": jnp.zeros((L, H), dtype),
        "attn_ln_scale": jnp.ones((L, H), dtype),
        "attn_ln_bias": jnp.zeros((L, H), dtype),
        # packed gated MLP: first half UP, second half GATE (converter
        # normalizes the checkpoint's packing to this convention)
        "up_gate_w": norm(next(keys), (L, H, 2 * I)),
        "down_w": norm(next(keys), (L, I, H)),
        "down_b": jnp.zeros((L, H), dtype),
        "mlp_ln_scale": jnp.ones((L, H), dtype),
        "mlp_ln_bias": jnp.zeros((L, H), dtype),
    }
    head = {
        "proj_w": norm(next(keys), (H, P)),
        "proj_b": jnp.zeros((P,), dtype),
    }
    return {"embeddings": emb, "layers": layers, "head": head}


def _rope_tables(seq_len: int, head_dim: int, theta: float):
    """(seq, head_dim/2) fp32 cos/sin tables."""
    positions = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = theta ** (-jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                      / head_dim)
    angles = positions[:, None] * freqs[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, N, S, D) with D even; rotate-half convention (pairs are
    (x[..., :D/2], x[..., D/2:]), matching HF rotary implementations)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[None, None, :, :].astype(x.dtype)
    sin = sin[None, None, :, :].astype(x.dtype)
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1)


def _encoder_layer(x: jax.Array, attention_mask: jax.Array, rope: tuple,
                   lp: dict, config: StellaConfig) -> jax.Array:
    B, S, H = x.shape
    N, D = config.num_heads, config.head_dim
    cos, sin = rope

    qkv = jnp.einsum("bsh,hd->bsd", x, lp["qkv_w"]) + lp["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, N, D).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    scale = 1.0 / jnp.sqrt(D).astype(q.dtype)
    scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
    scores = scores.astype(jnp.float32)
    scores = scores + jnp.where(attention_mask[:, None, None, :] > 0,
                                0.0, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bnst,bntd->bnsd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
    attn_out = jnp.einsum("bsh,hd->bsd", ctx, lp["o_w"]) + lp["o_b"]
    x = layer_norm(x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"],
                   config.layer_norm_eps)

    act = ACTIVATIONS[config.hidden_act]
    up_gate = jnp.einsum("bsh,hd->bsd", x, lp["up_gate_w"])
    up, gate = jnp.split(up_gate, 2, axis=-1)
    h = act(gate) * up
    mlp_out = jnp.einsum("bsi,ih->bsh", h, lp["down_w"]) + lp["down_b"]
    return layer_norm(x + mlp_out, lp["mlp_ln_scale"], lp["mlp_ln_bias"],
                      config.layer_norm_eps)


def encode_tokens(params: dict, input_ids: jax.Array,
                  attention_mask: jax.Array, config: StellaConfig,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Token ids → pooled, projected, (optionally) normalized fp32
    embeddings of shape (B, projection_dim)."""
    emb = params["embeddings"]
    B, S = input_ids.shape
    x = emb["word"][input_ids] + emb["token_type"][jnp.zeros_like(input_ids)]
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)

    rope = _rope_tables(S, config.head_dim, config.rope_theta)

    def body(carry, lp):
        return _encoder_layer(carry, attention_mask, rope, lp, config), None

    layers = {k: v.astype(compute_dtype) for k, v in params["layers"].items()}
    x, _ = jax.lax.scan(body, x, layers)

    pooled = masked_mean_pool(x, attention_mask)  # fp32
    head = params["head"]
    pooled = pooled @ head["proj_w"].astype(jnp.float32) + \
        head["proj_b"].astype(jnp.float32)
    if config.normalize:
        pooled = l2_normalize(pooled)
    return pooled.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_tokens_jit(params, input_ids, attention_mask, config,
                      compute_dtype=jnp.bfloat16):
    return encode_tokens(params, input_ids, attention_mask, config,
                         compute_dtype=compute_dtype)


def params_from_torch_state_dict(state_dict, config: StellaConfig,
                                 dtype=jnp.float32,
                                 vector_linear: dict = None) -> dict:
    """Convert a GTE-v1.5/"NewModel" torch state dict to our pytree.

    Handles the remote-code naming (`new.encoder.layer.{i}.attention.
    qkv_proj`, `mlp.up_gate_proj`, `attn_ln`, `mlp_ln`); torch linears are
    (out, in) and stored here as (in, out). The checkpoint packs
    up_gate_proj as [UP; GATE] rows — kept in that order. `vector_linear`
    is the stella `2_Dense_<dims>` head ({"weight", "bias"}); identity
    when absent."""
    sd = {}
    for key, tensor in state_dict.items():
        for prefix in ("new.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        sd[key] = np.asarray(tensor.detach().cpu().numpy()
                             if hasattr(tensor, "detach") else tensor)

    def get(name):
        return jnp.asarray(sd[name], dtype)

    H = config.hidden_size
    emb = {
        "word": get("embeddings.word_embeddings.weight"),
        "ln_scale": get("embeddings.LayerNorm.weight"),
        "ln_bias": get("embeddings.LayerNorm.bias"),
    }
    if "embeddings.token_type_embeddings.weight" in sd:
        emb["token_type"] = get("embeddings.token_type_embeddings.weight")
    else:
        emb["token_type"] = jnp.zeros((1, H), dtype)

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(config.num_layers):
            a = sd[fmt.format(i=i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype)

    p = "encoder.layer.{i}."
    layers = {
        "qkv_w": stack(p + "attention.qkv_proj.weight", transpose=True),
        "qkv_b": stack(p + "attention.qkv_proj.bias"),
        "o_w": stack(p + "attention.o_proj.weight", transpose=True),
        "o_b": stack(p + "attention.o_proj.bias"),
        "attn_ln_scale": stack(p + "attn_ln.weight"),
        "attn_ln_bias": stack(p + "attn_ln.bias"),
        "up_gate_w": stack(p + "mlp.up_gate_proj.weight", transpose=True),
        "down_w": stack(p + "mlp.down_proj.weight", transpose=True),
        "down_b": stack(p + "mlp.down_proj.bias"),
        "mlp_ln_scale": stack(p + "mlp_ln.weight"),
        "mlp_ln_bias": stack(p + "mlp_ln.bias"),
    }
    if vector_linear is not None:
        head = {
            "proj_w": jnp.asarray(np.asarray(vector_linear["weight"]).T,
                                  dtype),
            "proj_b": jnp.asarray(np.asarray(vector_linear["bias"]), dtype),
        }
    else:  # no head shipped: identity projection
        head = {
            "proj_w": jnp.eye(H, config.projection_dim, dtype=dtype),
            "proj_b": jnp.zeros((config.projection_dim,), dtype),
        }
    return {"embeddings": emb, "layers": layers, "head": head}
