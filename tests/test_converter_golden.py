"""Converter-determinism goldens (round-5 VERDICT item 4).

Pins a content hash of the converted JAX pytree for deterministic synthetic
state dicts, so any change to converter layout (transposes, key mapping,
stacking order, dtype) is caught locally — the guarantee that makes the
real-checkpoint parity matrix (scripts/parity_matrix.py) reproducible the
day weights are available. The state dicts are generated from a seeded
numpy RNG (NOT torch RNG, whose init distributions may change across torch
versions), so the pinned hashes depend only on our converter code.
"""

import hashlib

import numpy as np
import pytest
import torch

import jax


def _fill_deterministic(model, seed=42):
    """Replace every parameter/buffer with seeded numpy values (order =
    state_dict order, which is architecture-defined, not RNG-defined)."""
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    new = {}
    for key, value in sd.items():
        arr = rng.standard_normal(tuple(value.shape)).astype(np.float32)
        new[key] = torch.tensor(arr.reshape(value.shape), dtype=value.dtype) \
            if value.dtype.is_floating_point else value
    model.load_state_dict(new)
    return new


def _pytree_hash(params) -> str:
    """sha256 over path-sorted (path, fp32 bytes) pairs of every leaf."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    digest = hashlib.sha256()
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        digest.update(str(path).encode())
        digest.update(np.asarray(leaf, dtype=np.float32).tobytes())
    return digest.hexdigest()


class TestConverterGoldens:
    def test_bert_converter_hash(self):
        from transformers import BertConfig, BertModel

        from marqo_tpu.models.bert import (config_from_hf,
                                           params_from_torch_state_dict)
        cfg = BertConfig(vocab_size=128, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         intermediate_size=64,
                         max_position_embeddings=64, type_vocab_size=2)
        model = BertModel(cfg, add_pooling_layer=False).eval()
        sd = _fill_deterministic(model)
        params = params_from_torch_state_dict(sd, config_from_hf(cfg))
        assert _pytree_hash(params) == BERT_GOLDEN_HASH

    def test_xlmr_converter_hash(self):
        from transformers import XLMRobertaConfig, XLMRobertaModel

        from marqo_tpu.models.bert import (config_from_hf,
                                           params_from_torch_state_dict)
        cfg = XLMRobertaConfig(vocab_size=128, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               intermediate_size=64,
                               max_position_embeddings=66, pad_token_id=1)
        model = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
        sd = _fill_deterministic(model)
        params = params_from_torch_state_dict(sd, config_from_hf(cfg))
        assert _pytree_hash(params) == XLMR_GOLDEN_HASH

    def test_hf_clip_converter_hash(self):
        from transformers import CLIPConfig, CLIPModel

        from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                           params_from_hf_clip)
        hf_config = CLIPConfig(
            text_config={"vocab_size": 128, "hidden_size": 32,
                         "num_hidden_layers": 2, "num_attention_heads": 2,
                         "intermediate_size": 64,
                         "max_position_embeddings": 16, "eos_token_id": 127,
                         "bos_token_id": 126, "pad_token_id": 0},
            vision_config={"image_size": 32, "patch_size": 8,
                           "hidden_size": 32, "num_hidden_layers": 2,
                           "num_attention_heads": 2,
                           "intermediate_size": 64},
            projection_dim=24)
        model = CLIPModel(hf_config).eval()
        sd = _fill_deterministic(model)
        text_config = CLIPTextConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=16, projection_dim=24,
            eos_token_id=127)
        vision_config = CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, projection_dim=24)
        params = params_from_hf_clip(sd, text_config, vision_config)
        assert _pytree_hash(params) == CLIP_GOLDEN_HASH

    def test_hash_is_stable_across_runs(self):
        """The hashing itself is deterministic (two independent builds of
        the same fixture hash identically)."""
        from transformers import BertConfig, BertModel

        from marqo_tpu.models.bert import (config_from_hf,
                                           params_from_torch_state_dict)
        hashes = []
        for _ in range(2):
            cfg = BertConfig(vocab_size=64, hidden_size=16,
                             num_hidden_layers=1, num_attention_heads=2,
                             intermediate_size=32,
                             max_position_embeddings=32, type_vocab_size=2)
            model = BertModel(cfg, add_pooling_layer=False).eval()
            sd = _fill_deterministic(model, seed=7)
            params = params_from_torch_state_dict(sd, config_from_hf(cfg))
            hashes.append(_pytree_hash(params))
        assert hashes[0] == hashes[1]


# Pinned golden hashes. Update ONLY for an intentional converter-layout
# change, alongside a green parity suite (the parity tests prove the new
# layout still matches torch numerics).
BERT_GOLDEN_HASH = \
    "04043ad58a44dd44858c28a63440cf848fb8b41075ef0ef838bd492bb3b80488"
XLMR_GOLDEN_HASH = \
    "09d210063167eeb674315f1012f132cbc01ddec22c236cd47d62df69bbe4723f"
CLIP_GOLDEN_HASH = \
    "b162a1d7b18485cadb6b1e8750f1af02df75619f3ce5f158b5f6d1c8fe72d62e"
