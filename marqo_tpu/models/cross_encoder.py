"""Cross-encoder reranker in JAX.

Parity: reference s2_inference/reranking/cross_encoders.py ReRankerText —
HF cross-encoders (ms-marco MiniLM/TinyBERT family) scoring (query, text)
pairs; results re-sorted by the new score (rerank.rerank_search_results,
reranking/rerank.py:12-54 overwrites _score in place).

Architecture: the BERT-family encoder (models/bert.py) + pooler (dense+tanh
over CLS) + single-logit classification head — the exact
BertForSequenceClassification scoring graph, converted from torch
state dicts.
"""

import hashlib
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.core.exceptions import ModelLoadError
from marqo_tpu.inference.batching import pick_batch_bucket, pick_seq_bucket
from marqo_tpu.inference.types import Device
from marqo_tpu.models.bert import (TextEncoderConfig, config_from_hf,
                                   init_params,
                                   params_from_torch_state_dict)
from marqo_tpu.models.tokenizer import TextTokenizer

from dataclasses import replace
from functools import partial


def _no_pool_config(config: TextEncoderConfig) -> TextEncoderConfig:
    return replace(config, pooling="cls", normalize=False)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def cross_encoder_scores(params, input_ids, attention_mask, token_type_ids,
                         config, compute_dtype=jnp.bfloat16):
    """(B, S) pair encodings → (B,) relevance logits."""
    from marqo_tpu.models.bert import _encoder_layer
    from marqo_tpu.ops.common import layer_norm

    emb = params["encoder"]["embeddings"]
    B, S = input_ids.shape
    positions = jnp.arange(S, dtype=jnp.int32)[None, :]
    x = emb["word"][input_ids] + emb["position"][positions] + \
        emb["token_type"][token_type_ids]
    x = layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    x = x.astype(compute_dtype)
    masking = ("padding", attention_mask)

    def body(carry, lp):
        return _encoder_layer(carry, masking, lp, config), None

    from marqo_tpu.models.bert import _cast_layers
    layers = _cast_layers(params["encoder"]["layers"], compute_dtype)
    x, _ = jax.lax.scan(body, x, layers)

    cls = x[:, 0, :].astype(jnp.float32)
    pooled = jnp.tanh(cls @ params["pooler_w"].astype(jnp.float32) +
                      params["pooler_b"].astype(jnp.float32))
    logits = pooled @ params["classifier_w"].astype(jnp.float32) + \
        params["classifier_b"].astype(jnp.float32)
    return logits[:, 0]


class JaxCrossEncoder:
    """Reranker model wrapper (loads from HF hub / local dir / random-init
    for tests)."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, device: Device = Device.TPU,
                 properties: Optional[dict] = None):
        self.model_name = model_name
        self.device = device
        self.properties = dict(properties or {})
        self.config: Optional[TextEncoderConfig] = None
        self.params = None
        self.tokenizer: Optional[TextTokenizer] = None
        platform = "cpu" if device == Device.CPU else None
        try:
            self._jdevice = (jax.devices(platform)[0] if platform
                             else jax.devices()[0])
        except RuntimeError:
            self._jdevice = jax.devices()[0]

    def load(self) -> None:
        if self.properties.get("random_init"):
            self._load_random_init()
            return
        try:
            from transformers import (AutoConfig,
                                      AutoModelForSequenceClassification)
            repo = self.properties.get("name", self.model_name)
            hf_config = AutoConfig.from_pretrained(repo)
            self.config = _no_pool_config(config_from_hf(hf_config))
            torch_model = AutoModelForSequenceClassification.from_pretrained(repo)
            sd = torch_model.state_dict()
            encoder = params_from_torch_state_dict(sd, self.config,
                                                   dtype=self.compute_dtype)
            self.params = jax.device_put({
                "encoder": encoder,
                "pooler_w": jnp.asarray(
                    sd["bert.pooler.dense.weight"].numpy().T,
                    self.compute_dtype),
                "pooler_b": jnp.asarray(sd["bert.pooler.dense.bias"].numpy(),
                                        self.compute_dtype),
                "classifier_w": jnp.asarray(sd["classifier.weight"].numpy().T,
                                            self.compute_dtype),
                "classifier_b": jnp.asarray(sd["classifier.bias"].numpy(),
                                            self.compute_dtype),
            }, self._jdevice)
            del torch_model
            self.tokenizer = TextTokenizer.from_pretrained(repo, max_length=512)
        except Exception as e:
            raise ModelLoadError(
                f"Could not load cross-encoder `{self.model_name}`: {e}. "
                f"If running offline, pass properties.random_init for tests.",
                cause=e)

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        self.config = _no_pool_config(TextEncoderConfig(
            vocab_size=int(arch.get("vocab_size", 128)),
            hidden_size=int(arch.get("hidden_size", 16)),
            num_layers=int(arch.get("num_layers", 2)),
            num_heads=int(arch.get("num_heads", 2)),
            intermediate_size=int(arch.get("intermediate_size", 32)),
        ))
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        keys = jax.random.split(jax.random.PRNGKey(seed), 3)
        H = self.config.hidden_size
        self.params = jax.device_put({
            "encoder": init_params(self.config, keys[0],
                                   dtype=self.compute_dtype),
            "pooler_w": (jax.random.normal(keys[1], (H, H)) * 0.05).astype(
                self.compute_dtype),
            "pooler_b": jnp.zeros((H,), self.compute_dtype),
            "classifier_w": (jax.random.normal(keys[2], (H, 1)) * 0.05).astype(
                self.compute_dtype),
            "classifier_b": jnp.zeros((1,), self.compute_dtype),
        }, self._jdevice)
        self.tokenizer = TextTokenizer.build_test_wordpiece(max_length=128)

    def score(self, query: str, texts: List[str]) -> np.ndarray:
        """Relevance logits for (query, text) pairs."""
        if not texts:
            return np.zeros((0,), dtype=np.float32)
        pairs = self.tokenizer.encode_pairs(
            [query] * len(texts), texts,
            pad_to=pick_seq_bucket(min(
                self.tokenizer.max_length,
                self.tokenizer.max_pair_length([query] * len(texts), texts))))
        n = len(texts)
        bucket = pick_batch_bucket(n)
        out = []
        start = 0
        while start < n:
            size = min(bucket, n - start)
            shape = (bucket, pairs["input_ids"].shape[1])
            ids = np.zeros(shape, dtype=np.int32)
            mask = np.zeros(shape, dtype=np.int32)
            types = np.zeros(shape, dtype=np.int32)
            ids[:size] = pairs["input_ids"][start:start + size]
            mask[:size] = pairs["attention_mask"][start:start + size]
            types[:size] = pairs["token_type_ids"][start:start + size]
            mask[size:, 0] = 1
            scores = cross_encoder_scores(
                self.params,
                jax.device_put(jnp.asarray(ids), self._jdevice),
                jax.device_put(jnp.asarray(mask), self._jdevice),
                jax.device_put(jnp.asarray(types), self._jdevice),
                self.config, compute_dtype=self.compute_dtype)
            out.append(np.asarray(scores)[:size])
            start += size
        return np.concatenate(out).astype(np.float32)
