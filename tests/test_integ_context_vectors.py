"""Ported reference tests: context vectors in tensor search.

Source: /root/reference/tests/tensor_search/test_context_vectors_search.py
— context works with weighted-dict queries on structured + unstructured,
wrong dimension errors name the expected dimension, string query +
context is rejected ("only works when the query is a dictionary"),
zero/cancelling context weights leave scores unchanged, context-only
(None query) search works, and None query + None context is an error.
"""

import pytest

from marqo_tpu.api.models.index_settings import (FieldRequest, IndexSettings)
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import FieldType, IndexType
from marqo_tpu.exceptions import InvalidArgumentError
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

DIM = 384  # "random" model dimension
UNSTRUCTURED = "ctx-unstructured"
STRUCTURED = "ctx-structured"


@pytest.fixture(scope="module")
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="random").to_marqo_index(UNSTRUCTURED))
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="random",
        allFields=[FieldRequest(name="text_field_1", type=FieldType.Text)],
        tensorFields=["text_field_1"]).to_marqo_index(STRUCTURED))
    cfg.index_meta_cache.populate()
    for name in (UNSTRUCTURED, STRUCTURED):
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name=name,
            docs=[{"text_field_1": "A rider", "_id": "1"}],
            tensor_fields=(["text_field_1"] if name == UNSTRUCTURED
                           else None)))
        assert res["errors"] is False
    yield cfg
    inference.clear_loaded_models()


QUERY = {"A rider is riding a horse jumping over the barrier": 1}


@pytest.mark.parametrize("index_name", [UNSTRUCTURED, STRUCTURED])
class TestContextVectors:
    def test_search_with_context(self, config, index_name):
        res = tensor_search.search(
            config, index_name, text=QUERY,
            context={"tensor": [{"vector": [1.0] * DIM, "weight": 2},
                                {"vector": [2.0] * DIM, "weight": -1}]})
        assert len(res["hits"]) == 1

    def test_incorrect_tensor_dimension(self, config, index_name):
        with pytest.raises(InvalidArgumentError) as e:
            tensor_search.search(
                config, index_name, text=QUERY,
                context={"tensor": [{"vector": [1.0] * 3, "weight": 0},
                                    {"vector": [2.0] * DIM, "weight": 0}]})
        assert "does not match the expected dimension" in str(e.value)

    def test_string_query_with_context_rejected(self, config, index_name):
        with pytest.raises(InvalidArgumentError) as e:
            tensor_search.search(
                config, index_name,
                text="A rider is riding a horse jumping over the barrier",
                context={"tensor": [{"vector": [1.0] * DIM, "weight": 0}]})
        assert ("This is not supported as the context only works when the "
                "query is a dictionary.") in str(e.value)

    def test_score_unchanged_by_zero_weight_context(self, config,
                                                    index_name):
        res_1 = tensor_search.search(config, index_name, text=QUERY)
        res_2 = tensor_search.search(
            config, index_name, text=QUERY,
            context={"tensor": [{"vector": [1.0] * DIM, "weight": 0},
                                {"vector": [2.0] * DIM, "weight": 0}]})
        res_3 = tensor_search.search(
            config, index_name, text=QUERY,
            context={"tensor": [{"vector": [1.0] * DIM, "weight": -1},
                                {"vector": [1.0] * DIM, "weight": 1}]})
        assert res_1["hits"][0]["_score"] == \
            pytest.approx(res_2["hits"][0]["_score"], abs=1e-6)
        assert res_1["hits"][0]["_score"] == \
            pytest.approx(res_3["hits"][0]["_score"], abs=1e-6)

    def test_context_only_search(self, config, index_name):
        res = tensor_search.search(
            config, index_name, text=None,
            context={"tensor": [{"vector": [1.0] * DIM, "weight": 1},
                                {"vector": [2.0] * DIM, "weight": 2}]})
        assert len(res["hits"]) == 1

    def test_none_query_and_none_context_error(self, config, index_name):
        with pytest.raises(Exception) as e:
            tensor_search.search(config, index_name, text=None,
                                 context=None)
        assert ("One of Query(q) or context is required for TENSOR "
                "search but both are missing") in str(e.value)
