"""Cross-encoder reranker tests (random-init model, full JAX graph)."""

import numpy as np
import pytest

from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.inference.rerank import (clear_rerankers,
                                        rerank_search_results)
from marqo_tpu.inference.types import Device
from marqo_tpu.models.cross_encoder import JaxCrossEncoder

PROPS = {"random_init": True}


@pytest.fixture(autouse=True)
def clean():
    clear_rerankers()
    yield
    clear_rerankers()


class TestCrossEncoder:
    def test_scores_shape_and_determinism(self):
        model = JaxCrossEncoder("test-reranker", Device.CPU, PROPS)
        model.load()
        scores = model.score("red apple", ["a red apple", "a green pear",
                                           "a blue car"])
        assert scores.shape == (3,)
        again = model.score("red apple", ["a red apple"])
        assert abs(scores[0] - again[0]) < 1e-2

    def test_pair_encoding_has_type_ids(self):
        model = JaxCrossEncoder("test-reranker", Device.CPU, PROPS)
        model.load()
        pairs = model.tokenizer.encode_pairs(["query text"], ["doc text"])
        assert pairs["token_type_ids"].max() == 1
        assert pairs["attention_mask"].sum() > 4


class TestRerankIntegration:
    def test_rerank_overwrites_scores_and_sorts(self):
        result = {"hits": [
            {"_id": "a", "title": "red apple pie", "_score": 0.1},
            {"_id": "b", "title": "green pear tart", "_score": 0.9},
        ]}
        rerank_search_results(result, "red apple", "test-reranker",
                              device="cpu", searchable_attributes=["title"],
                              properties=PROPS)
        scores = [h["_score"] for h in result["hits"]]
        assert scores == sorted(scores, reverse=True)
        # scores are cross-encoder logits now, not the original 0.1/0.9
        assert set(scores) != {0.1, 0.9}

    def test_requires_searchable_attributes(self):
        with pytest.raises(InvalidArgumentError):
            rerank_search_results({"hits": [{"_id": "a"}]}, "q",
                                  "test-reranker", searchable_attributes=None,
                                  properties=PROPS)

    def test_search_with_reranker_e2e(self):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.inference import vectorise as inference
        from marqo_tpu.tensor_search import tensor_search
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("rr-index"))
        cfg.index_meta_cache.populate()
        tensor_search.add_documents(cfg, AddDocsParams(
            index_name="rr-index",
            docs=[{"_id": "1", "title": "red apple"},
                  {"_id": "2", "title": "green pear"}],
            tensor_fields=["title"]))
        res = tensor_search.search(
            cfg, "rr-index", text="apple", searchable_attributes=["title"],
            reranker="test-reranker", reranker_properties=PROPS)
        assert len(res["hits"]) == 2
        inference.clear_loaded_models()
