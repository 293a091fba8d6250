"""Ported reference tests: misc search behaviors (unstructured).

Source: /root/reference/tests/tensor_search/integ_tests/
test_search_unstructured.py — string-"true"/bool-True filter matrix
(:563-606), large int/float equality filters (:1260-1303), tensor-field
content starting with "::" (:1305-1324), numeric/bool values searchable
and filterable (:693-742), document round-trip in hits (:1326).
"""

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "search-misc"


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(INDEX))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


class TestBooleanFiltering:
    DOCS = [
        {"_id": "1", "text_field_1": "true", "text_field_2": "false",
         "bool_field_1": True, "bool_field_2": False,
         "text_field_3": "search me"},
        {"_id": "2", "text_field_1": "false", "text_field_2": "True",
         "bool_field_1": False, "bool_field_2": True,
         "text_field_3": "search me"},
    ]

    CASES = [
        ("text_field_1:true", 1, "1"),
        ("text_field_1:false", 1, "2"),
        ("bool_field_1:true", 1, "1"),
        ("bool_field_1:false", 1, "2"),
        ("text_field_2:true", 1, "2"),
        ("text_field_2:false", 1, "1"),
        ("bool_field_2:true", 1, "2"),
        ("bool_field_2:false", 1, "1"),
        ("bool_field_2:false AND bool_field_1:false", 0, None),
        ("bool_field_2:false AND text_field_1:true", 1, "1"),
    ]

    @pytest.mark.parametrize("search_method", ["LEXICAL", "TENSOR"])
    @pytest.mark.parametrize("filter_string,expected_hits,expected_id",
                             CASES)
    def test_string_and_real_boolean_filters(self, config, search_method,
                                             filter_string, expected_hits,
                                             expected_id):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=self.DOCS,
            tensor_fields=["text_field_1", "text_field_2",
                           "text_field_3"]))
        assert res["errors"] is False
        got = tensor_search.search(
            config, INDEX, text="search me", search_method=search_method,
            filter=filter_string)
        assert len(got["hits"]) == expected_hits, got["hits"]
        if expected_id:
            assert got["hits"][0]["_id"] == expected_id


class TestLargeNumberFiltering:
    DOCS = [
        {"long_field_1": 1, "_id": "0", "search_field": "some text"},
        {"long_field_1": -1, "_id": "1", "search_field": "some text"},
        {"long_field_1": 100232142864, "_id": "2",
         "search_field": "some text"},
        {"long_field_1": -923217213, "_id": "3",
         "search_field": "some text"},
        {"double_field_1": 10000000000.0, "_id": "4",
         "search_field": "some text"},
        {"double_field_1": -1000000000000.0, "_id": "5",
         "search_field": "some text"},
        {"double_field_1": 10000000000.12325, "_id": "6",
         "search_field": "some text"},
        {"double_field_1": -9999999999.87675, "_id": "7",
         "search_field": "some text"},
    ]

    def test_filter_on_large_integer_and_float(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=self.DOCS,
            tensor_fields=["search_field"]))
        assert res["errors"] is False, res
        stats = config.monitoring.get_index_stats(INDEX)
        assert stats["numberOfDocuments"] == len(self.DOCS)
        for doc in self.DOCS:
            numeric_field = [k for k in doc if k not in ("_id",
                                                         "search_field")][0]
            filter_string = f"{numeric_field}:{doc[numeric_field]}"
            got = tensor_search.search(
                config, INDEX, text="some text",
                search_method="LEXICAL", filter=filter_string)
            assert len(got["hits"]) == 1, (filter_string, got["hits"])
            assert got["hits"][0]["_id"] == doc["_id"]


class TestMiscContent:
    def test_search_with_content_double_colon(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=[{"_id": "1", "text_field": "::my_text"}],
            tensor_fields=["text_field"]))
        assert res["errors"] is False
        got = tensor_search.search(config, INDEX, text="some text")
        assert len(got["hits"]) == 1
        assert got["hits"][0]["_id"] == "1"

    def test_search_other_types_top_search(self, config):
        doc = {"an_int": 1, "a_float": 1.2, "a_bool": True,
               "some_str": "blah"}
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=[doc], tensor_fields=["some_str"]))
        assert res["errors"] is False
        for field, value in doc.items():
            for method in ("TENSOR", "LEXICAL"):
                # bool True filters as "true" in the DSL
                filter_value = str(value).lower() if isinstance(
                    value, bool) else value
                got = tensor_search.search(
                    config, INDEX, text=str(value), search_method=method,
                    filter=f"{field}:{filter_value}")
                assert "hits" in got, (field, method)

    def test_search_returned_document_round_trip(self, config):
        doc = {"_id": "d1", "title": "the quick brown fox",
               "an_int": 7, "a_float": 2.5, "a_bool": False}
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=[doc], tensor_fields=["title"]))
        assert res["errors"] is False
        got = tensor_search.search(config, INDEX, text="quick fox")
        hit = got["hits"][0]
        for key, value in doc.items():
            assert hit[key] == value
