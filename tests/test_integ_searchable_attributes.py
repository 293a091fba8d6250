"""Ported reference tests: searchable attributes.

Source: /root/reference/tests/tensor_search/test_searchable_attributes.py —
per-field restriction for tensor + lexical, combination with filters,
empty list = zero fields, None = all fields, identical behavior across
index types.
"""

import pytest

from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

STRUCTURED = "sa-structured"
SEMI = "sa-semi"

DOCS = [
    {"text_field_1": "exact match field", "text_field_2": "baaadd efgh ",
     "text_field_3": "some field efgh", "_id": "1"},
    {"text_field_1": "shouldn't really match ",
     "text_field_2": "exact match field",
     "text_field_3": "Random text here efgh", "_id": "2"},
    {"text_field_1": "shouldn't really match ",
     "text_field_2": "shouldn't really match",
     "text_field_3": "exact match field", "_id": "3"},
]


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    feats = [FieldFeature.LexicalSearch, FieldFeature.Filter]
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="test",
        allFields=[FieldRequest(name=f"text_field_{i}", type=FieldType.Text,
                                features=feats) for i in (1, 2, 3)],
        tensorFields=["text_field_1", "text_field_2", "text_field_3"],
    ).to_marqo_index(STRUCTURED))
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(SEMI))
    cfg.index_meta_cache.populate()
    for name in (STRUCTURED, SEMI):
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name=name, docs=DOCS,
            tensor_fields=["text_field_1", "text_field_2", "text_field_3"]
            if name == SEMI else None))
        assert res["errors"] is False
    yield cfg
    inference.clear_loaded_models()


@pytest.mark.parametrize("index_name", [STRUCTURED, SEMI])
class TestSearchableAttributes:
    def test_restricts_to_field(self, config, index_name):
        for field, expected_id in (("text_field_1", "1"),
                                   ("text_field_2", "2"),
                                   ("text_field_3", "3")):
            res = tensor_search.search(
                config, index_name, text="exact match field",
                searchable_attributes=[field])
            assert res["hits"][0]["_id"] == expected_id, field

    def test_with_filter(self, config, index_name):
        cases = [
            (["text_field_1", "text_field_2"], "exact match field",
             "text_field_3:(some field efgh)", "1"),
            (["text_field_1", "text_field_2"], "exact match field",
             "text_field_3:(Random text here efgh)", "2"),
            (["text_field_2", "text_field_3"], "exact match field",
             "text_field_2:(shouldn't really match)", "3"),
        ]
        for method in ("TENSOR", "LEXICAL"):
            for attrs, query, filter_string, expected_id in cases:
                res = tensor_search.search(
                    config, index_name, text=query, search_method=method,
                    searchable_attributes=attrs, filter=filter_string)
                assert res["hits"][0]["_id"] == expected_id, \
                    (method, attrs, filter_string)

    def test_empty_list_searches_nothing(self, config, index_name):
        for method in ("TENSOR", "LEXICAL"):
            res = tensor_search.search(
                config, index_name, text="exact match field",
                search_method=method, searchable_attributes=[])
            assert res["hits"] == [], method

    def test_none_searches_all(self, config, index_name):
        res = tensor_search.search(config, index_name,
                                   text="exact match field",
                                   searchable_attributes=None)
        assert len(res["hits"]) == 3
