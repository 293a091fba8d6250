"""Ported reference integ tests: search result format + retrieval knobs.

Source: /root/reference/tests/tensor_search/integ_tests/
test_search_semi_structured.py (network-free subset): response shape
(processingTimeMs/query/limit), per-doc dedup, highlights toggles,
attributes_to_retrieve matrix, result-count limits and validation,
empty/nonexistent-index behavior, long queries, int fields.
"""

import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "sfmt-index"


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


def _add(cfg, docs, tensor_fields):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=tensor_fields))
    assert res["errors"] is False, res


class TestSearchFormat:
    def test_search_format(self, config):
        _add(config, [
            {"abc": "Exact match hehehe", "other_field": "baaadd",
             "cool_field_1": "res res res", "_id": "5678"},
            {"abc": "random text", "other_field": "Close match hehehe",
             "_id": "1234"},
            {"cool_field_1": "somewhat match", "_id": "9000"},
        ], ["abc", "other_field", "cool_field_1"])
        res = tensor_search.search(config, INDEX,
                                   text="Exact match hehehe", limit=50)
        assert "processingTimeMs" in res and res["processingTimeMs"] > 0
        assert isinstance(res["processingTimeMs"], int)
        assert res["query"] == "Exact match hehehe"
        assert res["limit"] == 50

    def test_search_format_empty_index(self, config):
        res = tensor_search.search(config, INDEX, text="")
        assert res["processingTimeMs"] > 0
        assert isinstance(res["processingTimeMs"], int)
        assert res["query"] == ""
        assert res["limit"] > 0
        assert res["hits"] == []

    def test_search_nonexistent_index(self, config):
        with pytest.raises(IndexNotFoundError):
            tensor_search.search(config, "ghost-index", text="x")

    def test_each_doc_returned_once(self, config):
        """Multiple matching fields must not duplicate the doc."""
        _add(config, [
            {"abc": "Exact match hehehe efgh", "other_field": "baaadd efgh",
             "_id": "5678", "finally": "some field efgh"},
            {"abc": "shouldn't really match", "other_field": "Nope.....",
             "_id": "1234", "finally": "Random text here efgh"},
        ], ["abc", "other_field", "finally"])
        res = tensor_search.search(config, INDEX, text=" efgh ", limit=10)
        assert len(res["hits"]) == 2
        assert len({h["_id"] for h in res["hits"]}) == 2

    def test_long_query_string(self, config):
        _add(config, [{"_id": "1", "text": "some content here"}], ["text"])
        res = tensor_search.search(config, INDEX,
                                   text="hello " * 300)
        assert "hits" in res

    def test_search_int_field_does_not_error(self, config):
        _add(config, [
            {"abc": "some text", "_id": "5678", "my_int": 144},
            {"abc": "some text", "_id": "1234", "my_int": 88},
        ], ["abc"])
        for method in ("LEXICAL", "TENSOR"):
            res = tensor_search.search(config, INDEX, text="some text",
                                       search_method=method)
            assert len(res["hits"]) > 0


class TestHighlightsToggle:
    DOCS = [
        {"abc": "some text", "other_field": "baaadd", "_id": "5678"},
        {"abc": "some text", "other_field": "Close match hehehe",
         "_id": "1234"},
    ]

    def test_highlights_tensor(self, config):
        _add(config, self.DOCS, ["abc", "other_field"])
        on = tensor_search.search(config, INDEX, text="some text",
                                  show_highlights=True)
        assert len(on["hits"]) == 2
        for hit in on["hits"]:
            assert "_highlights" in hit
        off = tensor_search.search(config, INDEX, text="some text",
                                   show_highlights=False)
        for hit in off["hits"]:
            assert "_highlights" not in hit

    def test_lexical_highlights_shape(self, config):
        """Lexical hits carry _highlights == [] when highlights are on
        (reference test_lexical_search_no_highlights_format)."""
        _add(config, self.DOCS, [])
        res = tensor_search.search(config, INDEX, text="some text",
                                   search_method="LEXICAL")
        assert len(res["hits"]) == 2
        for hit in res["hits"]:
            assert hit["_highlights"] == []

    def test_tensor_highlights_shape(self, config):
        """Tensor hits carry exactly one dict highlight
        (reference test_tensor_search_highlights_format)."""
        _add(config, self.DOCS, ["abc", "other_field"])
        res = tensor_search.search(config, INDEX, text="some text")
        assert len(res["hits"]) == 2
        for hit in res["hits"]:
            assert isinstance(hit["_highlights"], list)
            assert len(hit["_highlights"]) == 1
            assert isinstance(hit["_highlights"][0], dict)

    def test_highlights_lexical(self, config):
        _add(config, self.DOCS, [])
        on = tensor_search.search(config, INDEX, text="some text",
                                  search_method="LEXICAL",
                                  show_highlights=True)
        assert len(on["hits"]) == 2
        for hit in on["hits"]:
            assert "_highlights" in hit
        off = tensor_search.search(config, INDEX, text="some text",
                                   search_method="LEXICAL",
                                   show_highlights=False)
        for hit in off["hits"]:
            assert "_highlights" not in hit


class TestAttributesToRetrieve:
    CASES = [
        (["void_field"], {"_id", "_score", "_highlights"}),
        ([], {"_id", "_score", "_highlights"}),
        (["field_1"], {"field_1", "_id", "_score", "_highlights"}),
        (["field_1", "field_2"],
         {"field_1", "field_2", "_id", "_score", "_highlights"}),
        (["field_1", "random_field", "random_lala", "marqomarqo"],
         {"field_1", "random_field", "random_lala", "marqomarqo", "_id",
          "_score", "_highlights"}),
        (None, {"field_1", "field_2", "random_field", "random_lala",
                "marqomarqo", "_id", "_score", "_highlights"}),
    ]

    @pytest.mark.parametrize("method", ["LEXICAL", "TENSOR"])
    def test_attributes_to_retrieve_matrix(self, config, method):
        _add(config, [{
            "field_1": "Exact match hehehe", "field_2": "baaadd",
            "random_field": "res res res",
            "random_lala": "res res res haha",
            "marqomarqo": "check check haha",
        }], ["field_1", "field_2"])
        for attrs, expected in self.CASES:
            res = tensor_search.search(
                config, INDEX, text="Exact match hehehe",
                attributes_to_retrieve=attrs, search_method=method)
            assert res["hits"], (method, attrs)
            got = set(res["hits"][0].keys())
            assert got == expected, (method, attrs)


class TestResultCountLimits:
    @pytest.mark.parametrize("method", ["LEXICAL", "TENSOR"])
    def test_limit_results(self, config, method, monkeypatch):
        docs = [{"_id": f"d{i}", "Title": f"a test of thing {i}"}
                for i in range(30)]
        _add(config, docs, ["Title"])
        for max_doc in (2, 10):
            monkeypatch.setenv("MARQO_MAX_RETRIEVABLE_DOCS", str(max_doc))
            half = tensor_search.search(config, INDEX, text="a test of",
                                        search_method=method,
                                        limit=max_doc // 2)
            assert half["limit"] == max_doc // 2
            assert len(half["hits"]) == max_doc // 2
            at = tensor_search.search(config, INDEX, text="a test of",
                                      search_method=method, limit=max_doc)
            assert at["limit"] == max_doc
            assert len(at["hits"]) == max_doc
            with pytest.raises(api_exceptions.IllegalRequestedDocCount):
                tensor_search.search(config, INDEX, text="a test of",
                                     search_method=method,
                                     limit=max_doc + 1)
            with pytest.raises(api_exceptions.IllegalRequestedDocCount):
                tensor_search.search(config, INDEX, text="a test of",
                                     search_method=method,
                                     limit=(max_doc + 1) * 2)

    def test_invalid_limit_results(self, config):
        for limit in (0, -1):
            with pytest.raises(api_exceptions.IllegalRequestedDocCount):
                tensor_search.search(config, INDEX, text="", limit=limit)
