"""Ported reference tests: lexical search behaviors.

Source: /root/reference/tests/tensor_search/test_lexical_search.py (field
names adapted to 2.13 semi-structured naming rules): multi-field ranking,
overwritten docs, filters incl. ranges and escaped names, list fields,
searchable attributes, bad query types, dotted filter values.
"""

import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "lex-index"


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


def _add(cfg, docs, tensor_fields=()):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=list(tensor_fields)))
    assert res["errors"] is False, res


def _lex(cfg, text, **kwargs):
    return tensor_search.search(cfg, INDEX, text=text,
                                search_method="LEXICAL", **kwargs)


class TestLexicalSearch:
    def test_bad_text_type(self, config):
        _add(config, [{"doc1": "some field 2"}])
        for bad in (None, 1234, 1.0):
            with pytest.raises(api_exceptions.InvalidArgError):
                _lex(config, bad)

    def test_no_index(self, config):
        with pytest.raises(IndexNotFoundError):
            tensor_search.search(config, "non-existent-index", text="x",
                                 search_method="LEXICAL")

    def test_multiple_field_ranking(self, config):
        d0 = {"doc1": "some FIELD 2", "_id": "alpha alpha",
              "big_field": "very unlikely theory. marqo is pretty awesom, "
                           "in the field"}
        d1 = {"title": "Marqo", "doc2": "some other thing", "_id": "abcdef"}
        _add(config, [d1, {"doc1": "some 2", "field_abc":
                           "robodog is not a cat", "_id": "unusual id"},
                      d0])
        res = _lex(config, "marqo field")
        assert len(res["hits"]) == 2
        # d0 matches both terms → ranks first
        assert res["hits"][0]["_id"] == "alpha alpha"
        assert res["hits"][1]["_id"] == "abcdef"

    def test_overwriting_doc(self, config):
        doc_id = "my id is awesome"
        _add(config, [{"_id": doc_id, "doc1": "some  2",
                       "big_field": "very unlikely theory. is pretty",
                       "boring_field": "4 grey boring walls. "}])
        assert _lex(config, "Marqo field")["hits"] == []
        grey = _lex(config, "4 grey boring walls")
        assert len(grey["hits"]) == 1
        assert grey["hits"][0]["_id"] == doc_id
        _add(config, [{"_id": doc_id, "doc1": "some FIELD 2",
                       "big_field": "just your average doc...",
                       "cool_field": "Marqo is the best!"}])
        cool = _lex(config, "Marqo field")
        assert len(cool["hits"]) == 1
        assert cool["hits"][0]["_id"] == doc_id
        assert _lex(config, "4 grey boring walls")["hits"] == []

    def test_filter_with_or_and_range(self, config):
        _add(config, [
            {"doc1": "some FIELD 2", "_id": "alpha alpha",
             "big_field": "marqo is pretty awesom, in the field",
             "Lucy": "Travis"},
            {"title": "Marqo", "doc2": "some other thing", "_id": "abcdef"},
            {"doc1": "some 2 jnkerkbj", "field_abc": "robodog",
             "_id": "Jupyter_12"},
            {"TITITLE": "Tony from the way",
             "field_lambda": "some prop field called marqo", "_id": "122"},
            {"Lucy": "Travis", "field_lambda": "a whole bunch of text. "
             "Just a slight mention of a field", "day": 190, "_id": "123"},
        ])
        res = _lex(config, "marqo field",
                   filter="title:Marqo OR (Lucy:Travis AND day:[51 TO *])",
                   limit=3)
        assert len(res["hits"]) == 2
        assert {h["_id"] for h in res["hits"]} == {"123", "abcdef"}

    def test_empty_searchable_attribs_returns_nothing(self, config):
        _add(config, [
            {"doc1": "extravagant FIELD", "_id": "alpha"},
            {"title": "Marqo", "_id": "abcdef"},
            {"field_abc": "extravagant robodog", "_id": "Jupyter_12"},
        ])
        res = _lex(config, "extravagant", searchable_attributes=[])
        assert res["hits"] == []

    def test_list_fields(self, config):
        _add(config, [
            {"abc": "some text", "other_field": "baaadd", "_id": "5678",
             "my_string": "b"},
            {"abc": "some text", "other_field": "Close match hehehe",
             "_id": "1234", "an_int": 2},
            {"abc": "some text", "_id": "1235",
             "my_list": ["tag1", "tag2 some"]},
            {"abc": "some text", "_id": "1001",
             "my_cool_list": ["b_1", "b2"], "fun_list": ["truk", "car"]},
        ])
        res = _lex(config, "tag1")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "1235"
        assert _lex(config, "tag55")["hits"] == []
        # 2.13 semi-structured arrays filter by EXACT element (the
        # legacy-unstructured word-level match was a pre-2.13 behavior;
        # semi_structured_vespa_schema_template.sd.jinja2:52 stores
        # attribute elements matched whole)
        res = _lex(config, "tag1", filter="my_list:(tag2 some)")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "1235"
        res = _lex(config, "b_1", filter="fun_list:truk")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "1001"

    def test_list_searchable_attr(self, config):
        _add(config, [
            {"abc": "some text", "_id": "1235",
             "my_list": ["tag1", "tag2 some"]},
            {"abc": "some text tag1 mention", "_id": "plain"},
        ])
        res = _lex(config, "tag1", searchable_attributes=["my_list"])
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "1235"
        res = _lex(config, "tag1", searchable_attributes=["abc"])
        assert [h["_id"] for h in res["hits"]] == ["plain"]

    def test_filter_with_dot_value(self, config):
        _add(config, [
            {"content": "a man on a horse",
             "filename": "Important_File_1.pdf", "_id": "123"},
            {"content": "the horse is eating grass",
             "filename": "Important_File_2.pdf", "_id": "456"},
        ])
        res = _lex(config, "horse",
                   filter="filename:(Important_File_1.pdf)")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "123"
