"""Tests for the vectorise() engine: registry, model cache, caching, eject."""

import numpy as np
import pytest

from marqo_tpu.core.exceptions import ModelError, VectoriseError
from marqo_tpu.inference import vectorise as v
from marqo_tpu.inference.model_registry import (
    get_model_properties_from_registry, load_model_properties)


@pytest.fixture(autouse=True)
def clean_model_cache():
    v.clear_loaded_models()
    v.clear_inference_cache()
    yield
    v.clear_loaded_models()
    v.clear_inference_cache()


class TestRegistry:
    def test_registry_has_reference_families(self):
        reg = load_model_properties()
        for name in ["hf/e5-base-v2", "hf/bge-base-en-v1.5", "ViT-B/32",
                     "open_clip/ViT-B-32/laion2b_s34b_b79k",
                     "sentence-transformers/all-MiniLM-L6-v2",
                     "random", "test", "no_model"]:
            assert name in reg, name

    def test_unknown_model_raises(self):
        with pytest.raises(ModelError):
            get_model_properties_from_registry("not-a-model")

    def test_e5_has_prefixes(self):
        props = get_model_properties_from_registry("hf/e5-base-v2")
        assert props["text_query_prefix"] == "query: "
        assert props["text_chunk_prefix"] == "passage: "
        assert props["dimensions"] == 768


class TestVectorise:
    def test_random_model_deterministic(self):
        a = v.vectorise("random/small", ["hello", "world"])
        b = v.vectorise("random/small", ["hello"])
        assert len(a) == 2 and len(a[0]) == 32
        np.testing.assert_allclose(a[0], b[0])
        assert not np.allclose(a[0], a[1])

    def test_random_model_normalized(self):
        out = v.vectorise("random/small", ["hello"])
        assert abs(np.linalg.norm(out[0]) - 1.0) < 1e-5

    def test_test_model_real_encoder(self):
        out = v.vectorise("test", ["the quick brown fox", "hello there"])
        arr = np.asarray(out)
        assert arr.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(arr, axis=1), 1.0, atol=1e-4)
        # deterministic across calls (bf16 compute: padding-bucket changes
        # may shift results by ~1e-3 in cosine, same bound as the reference)
        again = v.vectorise("test", ["the quick brown fox"])
        cos = float(np.dot(out[0], again[0]))
        assert cos > 1 - 1e-3, cos

    def test_single_string_content(self):
        out = v.vectorise("random/small", "hello")
        assert len(out) == 1

    def test_empty_content_raises(self):
        with pytest.raises(VectoriseError):
            v.vectorise("random/small", [])

    def test_no_model_raises(self):
        with pytest.raises(VectoriseError):
            v.vectorise("no_model", ["hello"],
                        model_properties={"type": "no_model", "dimensions": 32})

    def test_model_cache_and_eject(self):
        v.vectorise("random/small", ["x"])
        loaded = v.get_loaded_models()["models"]
        assert any(m["model_name"] == "random/small" for m in loaded)
        v.eject_model("random/small", "cpu")
        loaded = v.get_loaded_models()["models"]
        assert not any(m["model_name"] == "random/small" for m in loaded)

    def test_eject_missing_model_raises(self):
        from marqo_tpu.core.exceptions import ModelNotInCacheError
        with pytest.raises(ModelNotInCacheError):
            v.eject_model("never-loaded", "cpu")

    def test_custom_model_properties(self):
        out = v.vectorise("my-random", ["a"],
                          model_properties={"type": "random", "dimensions": 8})
        assert len(out[0]) == 8


class TestInferenceCache:
    def test_cache_hit_roundtrip(self, monkeypatch):
        monkeypatch.setenv("MARQO_INFERENCE_CACHE_SIZE", "16")
        v.clear_inference_cache()
        first = v.vectorise("test", ["cached content"], enable_cache=True)
        cache = v._get_inference_cache()
        assert len(cache) == 1
        second = v.vectorise("test", ["cached content"], enable_cache=True)
        np.testing.assert_allclose(first[0], second[0])

    def test_lru_eviction(self):
        from marqo_tpu.inference.inference_cache import MarqoInferenceCache
        cache = MarqoInferenceCache(cache_size=2, cache_type="LRU")
        cache.set("m", "a", [1.0]); cache.set("m", "b", [2.0])
        cache.get("m", "a")
        cache.set("m", "c", [3.0])  # evicts "b"
        assert cache.get("m", "a") == [1.0]
        assert cache.get("m", "b") is None
        assert cache.get("m", "c") == [3.0]

    def test_lfu_eviction(self):
        from marqo_tpu.inference.inference_cache import MarqoInferenceCache
        cache = MarqoInferenceCache(cache_size=2, cache_type="LFU")
        cache.set("m", "a", [1.0])
        cache.get("m", "a"); cache.get("m", "a")
        cache.set("m", "b", [2.0])
        cache.set("m", "c", [3.0])  # evicts "b" (lowest count)
        assert cache.get("m", "a") == [1.0]
        assert cache.get("m", "b") is None


class TestOversizedBatch:
    def test_vectorise_more_texts_than_largest_bucket(self):
        """Requests beyond the largest batch bucket (256) previously
        dropped embeddings past the bucket on the packed path (found by the
        e2e ingest bench: 512-doc add_documents)."""
        from marqo_tpu.inference import vectorise as v
        v.clear_loaded_models()
        texts = [f"document number {i} with several words" for i in range(300)]
        out = v.vectorise("test", texts, device="cpu")
        arr = np.asarray(out)
        assert arr.shape[0] == 300
        # identical text at positions 7 and 299 would differ if order broke
        again = v.vectorise("test", [texts[299]], device="cpu")
        np.testing.assert_allclose(arr[299], np.asarray(again)[0], atol=1e-4)
        v.clear_loaded_models()


class TestS2InferenceUtils:
    """Ported reference goldens (tests/s2_inference/test_utils.py):
    model-cache-key format and vectorised-output conversion."""

    def test_create_model_cache_key_format(self):
        from marqo_tpu.inference.vectorise import _create_model_cache_key
        props = {"name": "intfloat/e5-base-v2", "dimensions": 768,
                 "type": "hf", "tokens": 512}
        for device in ("cpu", "tpu", "cuda:1"):
            assert _create_model_cache_key("hf/e5-base-v2", device, props) \
                == ("hf/e5-base-v2||intfloat/e5-base-v2||768||hf||512||"
                    + device)

    def test_create_model_cache_key_missing_props(self):
        from marqo_tpu.inference.vectorise import _create_model_cache_key
        assert _create_model_cache_key("m", "cpu", {}) == "m||||||||||cpu"
        assert _create_model_cache_key("m", "cpu", None) == "m||||||||||cpu"

    def test_convert_vectorized_output(self):
        import torch

        from marqo_tpu.inference.vectorise import _float_list
        for list_o_list in ([[1, 2], [3, 4]], [[1, 2]]):
            assert _float_list(list_o_list) == [
                [float(x) for x in row] for row in list_o_list]
            assert _float_list(np.array(list_o_list, dtype=np.float32)) == [
                [float(x) for x in row] for row in list_o_list]
            assert _float_list(torch.tensor(list_o_list,
                                            dtype=torch.float32)) == [
                [float(x) for x in row] for row in list_o_list]
