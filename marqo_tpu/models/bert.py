"""BERT-family text encoder in pure functional JAX.

Covers the reference's HF text-model families (e5, SBERT/MiniLM, BGE,
multilingual-e5 / XLM-R — reference src/marqo/core/inference/
embedding_models/hugging_face_model.py:24-220 and sbert_utils.py): a post-LN
transformer encoder with absolute position embeddings, followed by
cls/mean pooling and L2 normalization.

TPU design:
  - Parameters are a pytree of stacked per-layer arrays (leading layer dim);
    the encoder body is one ``lax.scan`` over layers → single compiled
    block, minimal compile time, weights stay resident in HBM.
  - Compute dtype is bf16 by default (MXU-native); LayerNorm/softmax/pooling
    statistics accumulate in fp32 (ops/common.py), giving <1e-3 cosine
    drift vs. the fp32 torch reference.
  - All shapes static: callers pad (B, S) to bucketed sizes
    (inference/batching.py) so each bucket compiles once.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.ops.common import (ACTIVATIONS, cls_pool, l2_normalize,
                                  layer_norm, masked_mean_pool)


# cap on packed segments per row (ops/packing.py enforces it); sets the
# one-hot width of the fold-in segment-mask trick in _encoder_layer
_MAX_SEGMENTS_PER_ROW = 15


@dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    pooling: str = "mean"  # "mean" | "cls"
    normalize: bool = True
    # XLM-R/RoBERTa offset position ids by pad_token_id+1 (padding_idx=1)
    position_offset: int = 0
    attention_impl: str = "xla"  # "xla" | "pallas" | "flash"
    # W8A8 int8 linear layers (ops/quant.py): ~1.5-2x throughput on v5e,
    # small cosine drift — opt-in
    quantize: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def init_params(config: TextEncoderConfig, rng: jax.Array,
                dtype=jnp.float32) -> dict:
    """Random-init parameter pytree (stacked layers)."""
    H, I, L = config.hidden_size, config.intermediate_size, config.num_layers
    k = iter(jax.random.split(rng, 8))
    std = 0.02

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    emb = {
        "word": norm(next(k), (config.vocab_size, H)),
        "position": norm(next(k), (config.max_position_embeddings, H)),
        "token_type": norm(next(k), (config.type_vocab_size, H)),
        "ln_scale": jnp.ones((H,), dtype),
        "ln_bias": jnp.zeros((H,), dtype),
    }
    lk = jax.random.split(next(k), 8)
    layers = {
        "q_w": norm(lk[0], (L, H, H)), "q_b": jnp.zeros((L, H), dtype),
        "k_w": norm(lk[1], (L, H, H)), "k_b": jnp.zeros((L, H), dtype),
        "v_w": norm(lk[2], (L, H, H)), "v_b": jnp.zeros((L, H), dtype),
        "o_w": norm(lk[3], (L, H, H)), "o_b": jnp.zeros((L, H), dtype),
        "attn_ln_scale": jnp.ones((L, H), dtype),
        "attn_ln_bias": jnp.zeros((L, H), dtype),
        "ffn_w1": norm(lk[4], (L, H, I)), "ffn_b1": jnp.zeros((L, I), dtype),
        "ffn_w2": norm(lk[5], (L, I, H)), "ffn_b2": jnp.zeros((L, H), dtype),
        "ffn_ln_scale": jnp.ones((L, H), dtype),
        "ffn_ln_bias": jnp.zeros((L, H), dtype),
    }
    return {"embeddings": emb, "layers": layers}


_QUANTIZED_WEIGHT_NAMES = ("q_w", "k_w", "v_w", "o_w", "ffn_w1", "ffn_w2")


def _cast_layers(layers: dict, dtype) -> dict:
    """Cast float layer params to the compute dtype; int8 quantized values
    (``*_q``) and their fp32 scales (``*_s``) pass through untouched."""
    return {key: (value if key.endswith(("_q", "_s"))
                  else value.astype(dtype))
            for key, value in layers.items()}


def quantize_encoder_params(params: dict) -> dict:
    """Replace the six linear weights per layer with int8 values +
    per-out-channel scales (ops/quant.py). Pair with
    ``TextEncoderConfig(quantize=True)``."""
    from marqo_tpu.ops.quant import quantize_stacked_weight
    layers = dict(params["layers"])
    for name in _QUANTIZED_WEIGHT_NAMES:
        q, scale = quantize_stacked_weight(layers.pop(name))
        layers[name + "_q"] = q
        layers[name + "_s"] = scale
    return {"embeddings": params["embeddings"], "layers": layers}


def _encoder_layer(x: jax.Array, masking: tuple, lp: dict,
                   config: TextEncoderConfig) -> jax.Array:
    """One post-LN transformer block. x: (B, S, H).

    masking = ("padding", (B, S) 0/1 mask) or ("segment", (B, S) ids);
    the pallas path computes the mask in-kernel (no (B,S,S) in HBM)."""
    B, S, H = x.shape
    N, D = config.num_heads, config.head_dim
    mode, mask_data = masking

    if config.quantize:
        from marqo_tpu.ops.quant import int8_linear

        def linear(x_in, name, bias_name):
            return int8_linear(x_in, lp[name + "_q"], lp[name + "_s"][0],
                               lp[bias_name], out_dtype=x.dtype)
    else:
        def linear(x_in, name, bias_name):
            return jnp.einsum("bsh,hd->bsd", x_in, lp[name]) + lp[bias_name]

    def proj(name, bias_name):
        return linear(x, name, bias_name).reshape(
            B, S, N, D).transpose(0, 2, 1, 3)

    q = proj("q_w", "q_b")
    k = proj("k_w", "k_b")
    v = proj("v_w", "v_b")

    use_flash = config.attention_impl == "flash"
    if use_flash:
        from marqo_tpu.ops.fused_attention import fused_attention, supports
        use_flash = supports(S, masked=True)
    use_pallas = False
    if not use_flash and config.attention_impl == "pallas":
        from marqo_tpu.ops.flash_attention import (attention_padding,
                                                   attention_segment,
                                                   supports_shape)
        use_pallas = supports_shape(S)
    if use_flash:
        # pipelined Mosaic flash kernel (ops/fused_attention.py): scores
        # never touch HBM; block_b batches work per program. Pad rows
        # attend each other (segment 0) — their pooled outputs are
        # discarded by callers, matching the einsum path's contract.
        if mode == "segment":
            ctx = fused_attention(q, k, v, segment_ids=mask_data)
        else:
            ctx = fused_attention(q, k, v, pad_mask=mask_data)
        ctx = ctx.astype(q.dtype)
    elif use_pallas:
        if mode == "segment":
            ctx = attention_segment(q, k, v, mask_data)
        else:
            ctx = attention_padding(q, k, v, mask_data)
    elif mode == "segment":
        # block-diagonal mask from segment equality; measured fastest of
        # three alternatives on v5e (pallas per-head kernel: program-
        # overhead-bound; one-hot fold-in to the QK matmul: concat
        # materialization breaks XLA fusion)
        scale = 1.0 / jnp.sqrt(D).astype(q.dtype)
        scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
        scores = scores.astype(jnp.float32)
        allowed = (mask_data[:, None, :] == mask_data[:, :, None]) & \
            (mask_data[:, None, :] > 0)
        scores = scores + jnp.where(allowed[:, None], 0.0, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bnst,bntd->bnsd", probs, v)
    else:
        scale = 1.0 / jnp.sqrt(D).astype(q.dtype)
        scores = jnp.einsum("bnsd,bntd->bnst", q, k) * scale
        scores = scores.astype(jnp.float32)
        scores = scores + jnp.where(mask_data[:, None, None, :] > 0,
                                    0.0, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctx = jnp.einsum("bnst,bntd->bnsd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
    attn_out = linear(ctx, "o_w", "o_b")
    x = layer_norm(x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"],
                   config.layer_norm_eps)

    act = ACTIVATIONS[config.hidden_act]
    h = act(linear(x, "ffn_w1", "ffn_b1"))
    ffn_out = linear(h, "ffn_w2", "ffn_b2")
    return layer_norm(x + ffn_out, lp["ffn_ln_scale"], lp["ffn_ln_bias"],
                      config.layer_norm_eps)


def encode_tokens(params: dict, input_ids: jax.Array,
                  attention_mask: jax.Array, config: TextEncoderConfig,
                  token_type_ids: Optional[jax.Array] = None,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Full forward: token ids → pooled, (optionally) L2-normalized fp32
    embeddings of shape (B, H).
    """
    emb = params["embeddings"]
    B, S = input_ids.shape
    positions = jnp.arange(S, dtype=jnp.int32)[None, :] + config.position_offset
    x = emb["word"][input_ids] + emb["position"][positions]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + emb["token_type"][token_type_ids]
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)

    masking = ("padding", attention_mask)

    def body(carry, lp):
        return _encoder_layer(carry, masking, lp, config), None

    layers = _cast_layers(params["layers"], compute_dtype)
    x, _ = jax.lax.scan(body, x, layers)

    if config.pooling == "cls":
        pooled = cls_pool(x, attention_mask)
    else:
        pooled = masked_mean_pool(x, attention_mask)
    if config.normalize:
        pooled = l2_normalize(pooled)
    return pooled.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_tokens_jit(params, input_ids, attention_mask, config,
                      compute_dtype=jnp.bfloat16):
    return encode_tokens(params, input_ids, attention_mask, config,
                         compute_dtype=compute_dtype)


def encode_tokens_packed(params: dict, input_ids: jax.Array,
                         segment_ids: jax.Array, positions: jax.Array,
                         seq_index: jax.Array, num_sequences: int,
                         config: TextEncoderConfig,
                         compute_dtype=jnp.bfloat16) -> jax.Array:
    """Packed forward (ops/packing.py): multiple documents per row with
    block-diagonal attention by segment and segment-sum pooling.

    Returns (num_sequences, H) fp32 pooled embeddings. ``num_sequences``
    must be static (callers pad it to a bucket).
    """
    emb = params["embeddings"]
    B, S = input_ids.shape
    x = emb["word"][input_ids] + \
        emb["position"][positions + config.position_offset] + \
        emb["token_type"][jnp.zeros_like(input_ids)]
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)

    # block-diagonal attention: tokens attend only within their segment
    masking = ("segment", segment_ids)

    def body(carry, lp):
        return _encoder_layer(carry, masking, lp, config), None

    layers = _cast_layers(params["layers"], compute_dtype)
    x, _ = jax.lax.scan(body, x, layers)

    # segment pooling over the flattened token stream; pad tokens
    # (seq_index == -1) route to a trash row
    flat_h = x.reshape(B * S, -1).astype(jnp.float32)
    flat_idx = seq_index.reshape(B * S)
    trash = num_sequences
    flat_idx = jnp.where(flat_idx < 0, trash, flat_idx)
    if config.pooling == "cls":
        is_cls = (positions.reshape(B * S) == 0) & (
            segment_ids.reshape(B * S) > 0)
        weights = is_cls.astype(jnp.float32)
    else:
        weights = (segment_ids.reshape(B * S) > 0).astype(jnp.float32)
    sums = jax.ops.segment_sum(flat_h * weights[:, None], flat_idx,
                               num_segments=num_sequences + 1)
    counts = jax.ops.segment_sum(weights, flat_idx,
                                 num_segments=num_sequences + 1)
    pooled = sums[:num_sequences] / jnp.maximum(
        counts[:num_sequences, None], 1e-9)
    if config.normalize:
        pooled = l2_normalize(pooled)
    return pooled.astype(jnp.float32)


@partial(jax.jit, static_argnames=("num_sequences", "config", "compute_dtype"))
def encode_tokens_packed_jit(params, input_ids, segment_ids, positions,
                             seq_index, num_sequences, config,
                             compute_dtype=jnp.bfloat16):
    return encode_tokens_packed(params, input_ids, segment_ids, positions,
                                seq_index, num_sequences, config,
                                compute_dtype=compute_dtype)


def config_from_hf(hf_config) -> TextEncoderConfig:
    """Build a TextEncoderConfig from a transformers Bert/Roberta/XLM-R config."""
    model_type = getattr(hf_config, "model_type", "bert")
    offset = 0
    if model_type in ("roberta", "xlm-roberta"):
        offset = hf_config.pad_token_id + 1
    return TextEncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=getattr(hf_config, "type_vocab_size", 1) or 1,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act=hf_config.hidden_act,
        position_offset=offset,
    )


def params_from_torch_state_dict(state_dict, config: TextEncoderConfig,
                                 dtype=jnp.float32) -> dict:
    """Convert an HF Bert/Roberta-style torch ``state_dict`` to our pytree.

    Linear weights are stored (out, in) in torch; we store (in, out).
    Handles both bare-model keys (``embeddings.…``) and prefixed
    (``bert.embeddings.…`` / ``roberta.…``).
    """
    sd = {}
    for key, tensor in state_dict.items():
        for prefix in ("bert.", "roberta.", "model.", "xlm-roberta."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        sd[key] = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)

    def get(name):
        return jnp.asarray(sd[name], dtype)

    emb = {
        "word": get("embeddings.word_embeddings.weight"),
        "position": get("embeddings.position_embeddings.weight"),
        "ln_scale": get("embeddings.LayerNorm.weight"),
        "ln_bias": get("embeddings.LayerNorm.bias"),
    }
    if "embeddings.token_type_embeddings.weight" in sd:
        emb["token_type"] = get("embeddings.token_type_embeddings.weight")
    else:
        emb["token_type"] = jnp.zeros((1, config.hidden_size), dtype)

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(config.num_layers):
            a = sd[fmt.format(i=i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype)

    p = "encoder.layer.{i}."
    layers = {
        "q_w": stack(p + "attention.self.query.weight", transpose=True),
        "q_b": stack(p + "attention.self.query.bias"),
        "k_w": stack(p + "attention.self.key.weight", transpose=True),
        "k_b": stack(p + "attention.self.key.bias"),
        "v_w": stack(p + "attention.self.value.weight", transpose=True),
        "v_b": stack(p + "attention.self.value.bias"),
        "o_w": stack(p + "attention.output.dense.weight", transpose=True),
        "o_b": stack(p + "attention.output.dense.bias"),
        "attn_ln_scale": stack(p + "attention.output.LayerNorm.weight"),
        "attn_ln_bias": stack(p + "attention.output.LayerNorm.bias"),
        "ffn_w1": stack(p + "intermediate.dense.weight", transpose=True),
        "ffn_b1": stack(p + "intermediate.dense.bias"),
        "ffn_w2": stack(p + "output.dense.weight", transpose=True),
        "ffn_b2": stack(p + "output.dense.bias"),
        "ffn_ln_scale": stack(p + "output.LayerNorm.weight"),
        "ffn_ln_bias": stack(p + "output.LayerNorm.bias"),
    }
    return {"embeddings": emb, "layers": layers}
