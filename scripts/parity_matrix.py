"""Checkpoint-parity readiness pack (round-5 VERDICT item 4).

One command that produces the BASELINE.md north-star parity matrix — per
config: min cosine(JAX, torch) in fp32 and bf16 compute, plus top-k
retrieval agreement — for the five BASELINE.json benchmark configs:

  1. hf/e5-base-v2                     (BERT text encoder)
  2. openai CLIP ViT-B/32              (HF CLIP text+image towers)
  3. open_clip ViT-L/14 laion2b        (CLIP towers at L-size geometry,
                                        weighted multimodal combination)
  4. intfloat/multilingual-e5          (XLM-R text encoder)
  5. SpeechProcessing embed stage      (text encoder over transcripts; the
                                        reference example transcribes with
                                        an external ASR tool, then embeds —
                                        parity applies to the embed model)

Modes:
  --random-init (DEFAULT here: the environment has no hub egress)
      Random-initialized torch references at reduced geometry, converted
      with the exact production converter functions (models/*.py
      params_from_*). This proves architecture + conversion equivalence
      end-to-end, checkpoint-independent — the same guarantee the repo's
      parity test suite pins, gathered into one runnable matrix.
  --weights-dir DIR
      Real checkpoints from DIR/<slug>/ (HF `transformers` layout: config
      + weights + tokenizer). Loads the torch reference from the same
      files the converter reads, so the matrix becomes REAL-WEIGHT parity.
  (no flag, with egress)
      Pulls the real checkpoints from the hub (from_pretrained(repo)).

What real-weight mode will assert, the day egress (or a weights dir)
exists — thresholds from BASELINE.md:
  - min cosine(JAX fp32, torch fp32) >= 1 - 1e-5  (conversion exactness)
  - min cosine(JAX bf16, torch fp32) >= 1 - 1e-3  (the published target)
  - top-10 retrieval sets identical between JAX-bf16 and torch scores
    over the probe corpus (identical top-k recall)
Configs 2/3 additionally need their checkpoints in transformers CLIP
layout (open_clip-native .pt checkpoints require the open_clip package for
the torch side, which is not installed here; the JAX side's
params_from_open_clip handles that layout without it).

Exit status: 0 if every RUN config passes its thresholds; 1 otherwise.
Blocked configs (missing weights/egress) are reported, not failed.

Reference for the contract: BASELINE.md targets; reference encode paths
src/marqo/s2_inference/clip_utils.py:295 and
core/inference/embedding_models/hugging_face_model.py:172-220.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FP32_THRESHOLD = 1 - 1e-5
BF16_THRESHOLD = 1 - 1e-3
TOP_K = 10


# --- shared probe helpers ----------------------------------------------------

def _cos(a: np.ndarray, b: np.ndarray) -> float:
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return float((a * b).sum(-1).min())


def _topk_agreement(ref_emb: np.ndarray, our_emb: np.ndarray,
                    k: int = TOP_K) -> float:
    """Index the corpus with each implementation's embeddings; fraction of
    identical top-k sets over every corpus item used as the query
    (BASELINE 'identical top-k recall')."""
    ref = ref_emb / np.linalg.norm(ref_emb, axis=-1, keepdims=True)
    ours = our_emb / np.linalg.norm(our_emb, axis=-1, keepdims=True)
    agree = 0
    n = ref.shape[0]
    for i in range(n):
        t_ref = set(np.argsort(-(ref @ ref[i]))[:k].tolist())
        t_our = set(np.argsort(-(ours @ ours[i]))[:k].tolist())
        agree += t_ref == t_our
    return agree / n


def _token_corpus(vocab: int, n: int = 64, seq: int = 24, seed: int = 7,
                  reserve_low: int = 1, reserve_high: int = 0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(reserve_low, vocab - reserve_high, size=(n, seq))
    mask = np.ones((n, seq), dtype=np.int64)
    for i in range(n):
        pad_from = rng.integers(seq // 2, seq + 1)
        mask[i, pad_from:] = 0
        ids[i, pad_from:] = 0
    return ids.astype(np.int64), mask


# --- per-family evaluators ---------------------------------------------------

def eval_bert_family(torch_model, hf_cfg) -> dict:
    import jax.numpy as jnp
    import torch

    from marqo_tpu.models.bert import (config_from_hf, encode_tokens,
                                       params_from_torch_state_dict)
    config = config_from_hf(hf_cfg)
    params = params_from_torch_state_dict(torch_model.state_dict(), config)
    low = max(1, getattr(hf_cfg, "pad_token_id", 0) + 1 or 1)
    ids, mask = _token_corpus(config.vocab_size, reserve_low=low)
    with torch.no_grad():
        out = torch_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask))
        m = torch.tensor(mask).unsqueeze(-1).float()
        ref = (out.last_hidden_state * m).sum(1) / m.sum(1).clamp(min=1e-9)
        ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    ours32 = np.asarray(encode_tokens(params, jnp.asarray(ids),
                                      jnp.asarray(mask), config,
                                      compute_dtype=jnp.float32))
    ours16 = np.asarray(encode_tokens(params, jnp.asarray(ids),
                                      jnp.asarray(mask), config,
                                      compute_dtype=jnp.bfloat16))
    return {"cos_fp32": _cos(ref, ours32), "cos_bf16": _cos(ref, ours16),
            "topk_fp32": _topk_agreement(ref, ours32),
            "topk_bf16": _topk_agreement(ref, ours16)}


def eval_clip_family(torch_model, text_config, vision_config) -> dict:
    import jax.numpy as jnp
    import torch

    from marqo_tpu.models.clip import encode_clip_image, encode_clip_text
    from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

    params_holder = torch_model  # state dict converted by caller
    from marqo_tpu.models.clip import params_from_hf_clip
    params = params_from_hf_clip(torch_model.state_dict(), text_config,
                                 vision_config)
    # text probes: random ids with EOS terminators
    rng = np.random.default_rng(11)
    n, seq = 64, min(12, text_config.max_positions - 2)
    ids = rng.integers(1, text_config.eos_token_id - 1,
                       size=(n, seq)).astype(np.int64)
    ids[:, -1] = text_config.eos_token_id
    with torch.no_grad():
        ref_t = torch_model.get_text_features(
            input_ids=torch.tensor(ids)).numpy()
    ours_t32 = np.asarray(encode_clip_text(
        params, jnp.asarray(ids.astype(np.int32)), text_config,
        compute_dtype=jnp.float32))
    ours_t16 = np.asarray(encode_clip_text(
        params, jnp.asarray(ids.astype(np.int32)), text_config,
        compute_dtype=jnp.bfloat16))
    # image probes
    size = vision_config.image_size
    pixels = rng.integers(0, 256, size=(16, size, size, 3)).astype(np.uint8)
    x = pixels.astype(np.float32) / 255.0
    x = (x - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    with torch.no_grad():
        ref_i = torch_model.get_image_features(
            pixel_values=torch.tensor(x.transpose(0, 3, 1, 2),
                                      dtype=torch.float32)).numpy()
    ours_i32 = np.asarray(encode_clip_image(
        params, jnp.asarray(pixels), vision_config,
        compute_dtype=jnp.float32))
    ours_i16 = np.asarray(encode_clip_image(
        params, jnp.asarray(pixels), vision_config,
        compute_dtype=jnp.bfloat16))
    del params_holder
    return {
        "cos_fp32": min(_cos(ref_t, ours_t32), _cos(ref_i, ours_i32)),
        "cos_bf16": min(_cos(ref_t, ours_t16), _cos(ref_i, ours_i16)),
        "topk_fp32": _topk_agreement(ref_t, ours_t32),
        "topk_bf16": _topk_agreement(ref_t, ours_t16),
    }


# --- config builders ---------------------------------------------------------

def _bert_fixture(seed, vocab=512, hidden=64, layers=3, heads=4, inter=128):
    import torch
    from transformers import BertConfig, BertModel
    torch.manual_seed(seed)
    cfg = BertConfig(vocab_size=vocab, hidden_size=hidden,
                     num_hidden_layers=layers, num_attention_heads=heads,
                     intermediate_size=inter, max_position_embeddings=128,
                     type_vocab_size=2)
    return BertModel(cfg, add_pooling_layer=False).eval(), cfg


def _xlmr_fixture(seed):
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel
    torch.manual_seed(seed)
    cfg = XLMRobertaConfig(vocab_size=512, hidden_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           intermediate_size=128,
                           max_position_embeddings=132, pad_token_id=1)
    return XLMRobertaModel(cfg, add_pooling_layer=False).eval(), cfg


def _clip_fixture(seed, width=32, layers=2, heads=2, proj=24, image=32,
                  patch=8):
    import torch
    from transformers import CLIPConfig, CLIPModel

    from marqo_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
    torch.manual_seed(seed)
    hf_config = CLIPConfig(
        text_config={"vocab_size": 128, "hidden_size": width,
                     "num_hidden_layers": layers,
                     "num_attention_heads": heads,
                     "intermediate_size": width * 2,
                     "max_position_embeddings": 16, "eos_token_id": 127,
                     "bos_token_id": 126, "pad_token_id": 0},
        vision_config={"image_size": image, "patch_size": patch,
                       "hidden_size": width, "num_hidden_layers": layers,
                       "num_attention_heads": heads,
                       "intermediate_size": width * 2},
        projection_dim=proj)
    model = CLIPModel(hf_config).eval()
    text_config = CLIPTextConfig(
        vocab_size=128, hidden_size=width, num_layers=layers,
        num_heads=heads, intermediate_size=width * 2, max_positions=16,
        projection_dim=proj, eos_token_id=127)
    vision_config = CLIPVisionConfig(
        image_size=image, patch_size=patch, hidden_size=width,
        num_layers=layers, num_heads=heads, intermediate_size=width * 2,
        projection_dim=proj)
    return model, text_config, vision_config


def run_config(name: str, mode: str, weights_dir: str) -> dict:
    """Returns {"status": "pass"|"fail"|"blocked", metrics...}."""
    real_slug = {
        "e5-base-v2": "intfloat/e5-base-v2",
        "clip-vit-b32": "openai/clip-vit-base-patch32",
        "clip-vit-l14": "laion/CLIP-ViT-L-14-laion2B-s32B-b82K",
        "multilingual-e5": "intfloat/multilingual-e5-base",
        "speech-embed": "intfloat/e5-small-v2",
    }[name]
    try:
        if mode == "random-init":
            if name == "e5-base-v2":
                metrics = eval_bert_family(*_bert_fixture(seed=0))
            elif name == "clip-vit-b32":
                metrics = eval_clip_family(*_clip_fixture(seed=1))
            elif name == "clip-vit-l14":
                # L-geometry ratios at reduced size (deeper/wider than B)
                metrics = eval_clip_family(*_clip_fixture(
                    seed=2, width=48, layers=3, heads=4, proj=32,
                    image=28, patch=14))
            elif name == "multilingual-e5":
                metrics = eval_bert_family(*_xlmr_fixture(seed=3))
            else:  # speech-embed
                metrics = eval_bert_family(*_bert_fixture(
                    seed=4, hidden=48, layers=2))
        else:
            source = (os.path.join(weights_dir, real_slug.split("/")[-1])
                      if weights_dir else real_slug)
            if weights_dir and not os.path.isdir(source):
                return {"status": "blocked", "config": name,
                        "reason": f"no checkpoint at {source}"}
            if name in ("clip-vit-b32", "clip-vit-l14"):
                import torch
                from transformers import CLIPModel

                from marqo_tpu.models.clip import (CLIPTextConfig,
                                                   CLIPVisionConfig)
                model = CLIPModel.from_pretrained(source).eval()
                tc, vc = model.config.text_config, model.config.vision_config
                text_config = CLIPTextConfig(
                    vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
                    num_layers=tc.num_hidden_layers,
                    num_heads=tc.num_attention_heads,
                    intermediate_size=tc.intermediate_size,
                    max_positions=tc.max_position_embeddings,
                    projection_dim=model.config.projection_dim,
                    eos_token_id=tc.eos_token_id)
                vision_config = CLIPVisionConfig(
                    image_size=vc.image_size, patch_size=vc.patch_size,
                    hidden_size=vc.hidden_size,
                    num_layers=vc.num_hidden_layers,
                    num_heads=vc.num_attention_heads,
                    intermediate_size=vc.intermediate_size,
                    projection_dim=model.config.projection_dim)
                metrics = eval_clip_family(model, text_config, vision_config)
            else:
                from transformers import AutoConfig, AutoModel
                model = AutoModel.from_pretrained(source).eval()
                metrics = eval_bert_family(model,
                                           AutoConfig.from_pretrained(source))
    except Exception as e:
        # "blocked" is an ENVIRONMENT verdict (no egress / missing
        # checkpoint), only possible in real-weights mode. Random-init
        # mode has no external dependency: any exception there is a
        # genuine regression (e.g. a broken converter) and must FAIL the
        # gate, not exit 0 as blocked.
        status = "blocked" if mode != "random-init" else "fail"
        return {"status": status, "config": name,
                "reason": f"{type(e).__name__}: {e}"}

    # topk under bf16 compute is only thresholded with REAL weights:
    # random-init embeddings are near-degenerate (inter-doc score gaps
    # below bf16 resolution), so rank flips there are noise, not parity
    # failures — fp32 topk must be exact in both modes.
    passed = (metrics["cos_fp32"] >= FP32_THRESHOLD and
              metrics["cos_bf16"] >= BF16_THRESHOLD and
              metrics["topk_fp32"] >= 0.99 and
              (mode == "random-init" or metrics["topk_bf16"] >= 0.99))
    return {"status": "pass" if passed else "fail", "config": name,
            "checkpoint": (real_slug if mode != "random-init"
                           else "random-init"),
            **{k: round(v, 6) for k, v in metrics.items()}}


CONFIGS = ["e5-base-v2", "clip-vit-b32", "clip-vit-l14",
           "multilingual-e5", "speech-embed"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--random-init", action="store_true",
                        help="random-init torch references (no egress)")
    parser.add_argument("--weights-dir", type=str, default=None,
                        help="local checkpoint dir (one subdir per model)")
    parser.add_argument("--configs", type=str, default=",".join(CONFIGS))
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    mode = "random-init" if args.random_init else "real"
    rows = [run_config(c, mode, args.weights_dir)
            for c in args.configs.split(",") if c]
    report = {"mode": mode,
              "thresholds": {"cos_fp32": FP32_THRESHOLD,
                             "cos_bf16": BF16_THRESHOLD,
                             "topk_fp32": 0.99,
                             "topk_bf16": "0.99 (real-weights mode only)"},
              "matrix": rows}
    print(json.dumps(report, indent=2))
    failures = [r for r in rows if r["status"] == "fail"]
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
