"""Ported reference integ tests: search filtering + lexical behaviors.

Source: /root/reference/tests/tensor_search/integ_tests/test_search_combined.py
(filter matrix, IN-operator semantics and type rules, _id filtering,
spaced fields, bad syntax, empty/wildcard lexical queries, lexical
scores, escaped quotes, search-method validation, enable_cache).
"""

import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import (FilterStringParsingError,
                                       InvalidArgumentError,
                                       InvalidDataTypeError)
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

STRUCTURED = "sf-structured"
UNSTRUCTURED = "sf-unstructured"


def _structured_settings():
    f = FieldRequest
    feats = [FieldFeature.LexicalSearch, FieldFeature.Filter]
    return IndexSettings(
        type=IndexType.Structured, model="test",
        allFields=[
            f(name="text_field_1", type=FieldType.Text, features=feats),
            f(name="text_field_2", type=FieldType.Text, features=feats),
            f(name="text_field_3", type=FieldType.Text, features=feats),
            f(name="text_field_7", type=FieldType.Text, features=feats),
            f(name="text_field_8", type=FieldType.Text, features=feats),
            f(name="int_field_1", type=FieldType.Int,
              features=[FieldFeature.Filter]),
            f(name="long_field_1", type=FieldType.Long,
              features=[FieldFeature.Filter]),
            f(name="float_field_1", type=FieldType.Float,
              features=[FieldFeature.Filter]),
            f(name="double_field_1", type=FieldType.Double,
              features=[FieldFeature.Filter]),
            f(name="bool_field_1", type=FieldType.Bool,
              features=[FieldFeature.Filter]),
            f(name="bool_field_2", type=FieldType.Bool,
              features=[FieldFeature.Filter]),
            f(name="list_field_1", type=FieldType.ArrayText,
              features=[FieldFeature.Filter]),
            f(name="custom_vector_field_1", type=FieldType.CustomVector,
              features=[FieldFeature.Filter, FieldFeature.LexicalSearch]),
        ],
        tensorFields=["text_field_1", "text_field_2", "text_field_3",
                      "custom_vector_field_1"],
    )


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        _structured_settings().to_marqo_index(STRUCTURED))
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(UNSTRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _dims(cfg, name):
    return cfg.index_meta_cache.get_index(name).model.get_dimension()


def _add_filter_corpus(cfg, name):
    unstructured = name == UNSTRUCTURED
    docs = [
        {"_id": "5678", "text_field_1": "some text", "text_field_2": "baaadd",
         "text_field_3": "b"},
        {"_id": "1234", "text_field_1": "some text",
         "text_field_2": "Close match hehehe", "int_field_1": 2},
        {"_id": "1233", "text_field_1": "some text",
         "text_field_2": "Close match hehehe", "bool_field_1": True},
        {"_id": "1232", "text_field_1": "true"},
        {"_id": "1231", "text_field_1": "some text", "bool_field_2": False},
        {"_id": "in1", "text_field_1": "random1", "int_field_1": 100,
         "text_field_7": "multimodal red herring"},
        {"_id": "in2", "text_field_1": "blahblah", "int_field_1": 200,
         "long_field_1": 300, "text_field_7": "multimodal correct",
         "text_field_8": "multimodal correct",
         "custom_vector_field_1": {
             "content": "custom vector text!",
             "vector": [1.0] * _dims(cfg, name)}},
    ]
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=name, docs=docs,
        tensor_fields=["text_field_1", "text_field_2", "text_field_3",
                       "custom_vector_field_1"] if unstructured else None,
        mappings={"custom_vector_field_1": {"type": "custom_vector"}}
        if unstructured else None))
    assert res["errors"] is False, res


class TestFiltering:
    CASES = [
        ("text_field_3:c", 0, None),
        ("int_field_1:2", 1, ["1234"]),
        ("text_field_3:b", 1, ["5678"]),
        ("int_field_1:5", 0, None),
        ("int_field_1:[5 TO 30]", 0, None),
        ("int_field_1:[0 TO 30]", 1, ["1234"]),
        ("bool_field_1:true", 1, ["1233"]),
        ("bool_field_1:True", 1, ["1233"]),
        ("bool_field_1:tRue", 1, ["1233"]),
        ("bool_field_2:false", 1, ["1231"]),
        ("bool_field_1:false", 0, None),
        ("bool_field_1:some_value", 0, None),
        ("int_field_1:[0 TO 30] OR bool_field_1:true", 2, None),
        ("(int_field_1:[0 TO 30] AND int_field_1:2) AND "
         "text_field_1:(some text)", 1, ["1234"]),
        ("text_field_1:true", 1, ["1232"]),
    ]

    IN_CASES = [
        ("text_field_1 in (random1, true)", 2, ["in1", "1232"]),
        ("int_field_1 in (100, 200)", 2, ["in1", "in2"]),
        ("long_field_1 in (299, 300)", 1, ["in2"]),
        ("custom_vector_field_1 in ((custom vector text!))", 1, ["in2"]),
        ("text_field_7 in ((multimodal correct)) AND "
         "text_field_8 in ((multimodal correct))", 1, ["in2"]),
        ("text_field_1 in (random1, true) AND int_field_1:100", 1, ["in1"]),
        ("text_field_1 in (random1, true) OR text_field_2:baaadd", 3,
         ["in1", "1232", "5678"]),
        ("text_field_1 in (random1, true) OR int_field_1:[90 TO 210]", 3,
         ["in1", "1232", "in2"]),
        ("text_field_1 in (random1)", 1, ["in1"]),
        ("text_field_1 in (blahblahblah)", 0, None),
        ("NOT text_field_1 in (random1, true)", 5,
         ["5678", "1234", "1233", "1231", "in2"]),
        ("text_field_1 in (random1, true) AND int_field_1 in (100, 200)",
         1, ["in1"]),
        ("int_field_1 in (123, 456, 789)", 0, None),
        ("text_field_1 in ()", 0, None),
    ]

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_filtering(self, config, index_name):
        _add_filter_corpus(config, index_name)
        cases = list(self.CASES)
        if index_name == STRUCTURED:
            cases += self.IN_CASES
        for filter_string, expected_hits, expected_ids in cases:
            res = tensor_search.search(
                config, index_name, text="", limit=5, filter=filter_string)
            assert len(res["hits"]) == expected_hits, \
                f"{filter_string}: {[h['_id'] for h in res['hits']]}"
            if expected_ids:
                assert {h["_id"] for h in res["hits"]} == set(expected_ids), \
                    filter_string

    def test_filter_unstructured_index_in_keyword_fails(self, config):
        cases = [
            "text_field_1 in (random1, true)",
            "int_field_1 in (100, 200)",
            "long_field_1 in (299, 300)",
            "text_field_1 in (random1, true) AND int_field_1:100",
            "text_field_1 in (random1, true) OR text_field_2:baaadd",
            "text_field_1 in (random1, true) OR int_field_1:[90 TO 210]",
            "text_field_1 in (random1)",
            "NOT text_field_1 in (random1, true)",
            "text_field_1 IN (random1, true) AND int_field_1 in (100, 200)",
            "text_field_1 IN ()",
        ]
        for case in cases:
            with pytest.raises(InvalidArgumentError) as e:
                tensor_search.search(config, UNSTRUCTURED, text="",
                                     filter=case)
            assert "'IN' filter keyword is not yet supported for " \
                   "unstructured" in str(e.value)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_filter_id(self, config, index_name):
        docs = [{"_id": i, "text_field_1": "some text"}
                for i in ("1", "doc1", "doc5", "50")]
        tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name, docs=docs,
            tensor_fields=["text_field_1"]
            if index_name == UNSTRUCTURED else None))
        cases = [
            ("_id:1", 1, ["1"]),
            ("_id:doc1", 1, ["doc1"]),
            ("_id:51", 0, None),
            ("_id:1 OR _id:doc1", 2, ["1", "doc1"]),
            ("_id:1 OR _id:doc1 OR _id:50", 3, ["1", "doc1", "50"]),
            ("_id:1 OR _id:doc1 OR _id:50 OR _id:51", 3, ["1", "doc1", "50"]),
            ("_id:1 AND _id:doc1", 0, None),
        ]
        if index_name == STRUCTURED:
            cases += [
                ("_id in (1)", 1, ["1"]),
                ("_id in (doc1, (random garbage id))", 1, ["doc1"]),
                ("_id in (51)", 0, None),
                ("_id in (1, doc1)", 2, ["1", "doc1"]),
                ("_id in (1, doc1, 50)", 3, ["1", "doc1", "50"]),
                ("_id in (1, doc1, 50, (random id))", 3, ["1", "doc1", "50"]),
                ("_id in (1, doc1) OR _id:doc5", 3, ["1", "doc1", "doc5"]),
                ("_id in (1) AND _id in (doc1)", 0, None),
            ]
        for filter_string, expected_hits, expected_ids in cases:
            res = tensor_search.search(config, index_name, text="some text",
                                       filter=filter_string)
            assert len(res["hits"]) == expected_hits, filter_string
            if expected_ids:
                assert {h["_id"] for h in res["hits"]} == set(expected_ids)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_filter_spaced_fields(self, config, index_name):
        docs = [
            {"_id": "5678", "text_field_1": "some text",
             "text_field_2": "baaadd", "text_field_3": "b"},
            {"_id": "1234", "text_field_1": "some text",
             "text_field_2": "Close match hehehe", "int_field_1": 2},
            {"_id": "1233", "text_field_1": "some text",
             "text_field_2": "Close match hehehe", "bool_field_1": True},
            {"_id": "344", "text_field_1": "some text",
             "float_field_1": 0.548, "bool_field_1": True},
        ]
        tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name, docs=docs,
            tensor_fields=["text_field_1", "text_field_2", "text_field_3"]
            if index_name == UNSTRUCTURED else None))
        cases = [
            ("text_field_2:baaadd", 1, ["5678"]),
            ("text_field_2:(Close match hehehe)", 2, ["1234", "1233"]),
            ("(float_field_1:[0 TO 1]) AND (text_field_1:(some text))", 1,
             ["344"]),
        ]
        if index_name == STRUCTURED:
            cases += [
                ("text_field_2 in ((Close match hehehe), (something else))",
                 2, ["1234", "1233"]),
                ("(float_field_1:[0 TO 1]) AND "
                 "(text_field_1 in ((some text)))", 1, ["344"]),
            ]
        for filter_string, expected_hits, expected_ids in cases:
            res = tensor_search.search(config, index_name, text="",
                                       filter=filter_string)
            assert len(res["hits"]) == expected_hits, filter_string
            for expected_id in expected_ids:
                assert expected_id in [h["_id"] for h in res["hits"]]

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_filtering_bad_syntax(self, config, index_name):
        _add_filter_corpus(config, index_name)
        bad = [
            "(text_field_2):baaadd",
            "(int_field_1:[0 TO 30] and int_field_1:2) AND "
            "text_field_1:(some text)",
            "",
        ]
        if index_name == STRUCTURED:
            bad += [
                "text_field_2 IN (1, 2 OR 3)",
                "text_field_2 IN (1, 2 AND 3)",
                "text_field_2 IN (1, 2 NOT 3)",
                "text_field_2 IN (1, 2, 3))",
                "text_field_2 IN (val1, val 2, val3)",
                "text_field_2 IN 1, 2, 3)",
            ]
        for filter_string in bad:
            with pytest.raises(FilterStringParsingError):
                tensor_search.search(config, index_name, text="some text",
                                     limit=3, filter=filter_string)

    def test_filtering_in_with_wrong_type(self, config):
        _add_filter_corpus(config, STRUCTURED)
        cases = [
            ("int_field_1 IN (1,2,not_int)",
             "'not_int', which is not of type 'int'"),
            ("float_field_1 IN (1.2, 1.3, 2.4)", "unsupported type: 'float'"),
            ("double_field_1 IN (1.2, 1.3, 2.4)",
             "unsupported type: 'double'"),
            ("bool_field_1 IN (true)", "unsupported type: 'bool'"),
        ]
        for filter_string, message in cases:
            with pytest.raises(InvalidDataTypeError) as e:
                tensor_search.search(config, STRUCTURED, text="some text",
                                     limit=3, filter=filter_string)
            assert message in str(e.value), filter_string


class TestLexicalBehaviors:
    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_empty_lexical_query(self, config, index_name):
        tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name,
            docs=[{"_id": str(i), "text_field_1": f"document_{i}"}
                  for i in range(1, 5)],
            tensor_fields=["text_field_1"]
            if index_name == UNSTRUCTURED else None))
        res = tensor_search.search(config, index_name, text="",
                                   search_method="LEXICAL", limit=10)
        assert "hits" in res
        assert len(res["hits"]) == 0

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_wildcard_lexical_query(self, config, index_name):
        docs = [{"_id": str(i), "text_field_1": f"document_{i}"}
                for i in range(1, 4)]
        docs.append({"_id": "4", "text_field_1": "document_4",
                     "list_field_1": ["tag1", "tag2 some"]})
        tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name, docs=docs,
            tensor_fields=["text_field_1"]
            if index_name == UNSTRUCTURED else None))
        variations = [
            ("*", 4, None),
            ("*", 1, "list_field_1:tag1"),
            ('"*"', 0, None),
            ('"exact" *', 0, None),
            ('"*" optional', 0, None),
        ]
        for query, expected, filter_term in variations:
            res = tensor_search.search(config, index_name, text=query,
                                       search_method="LEXICAL", limit=10,
                                       filter=filter_term)
            assert len(res["hits"]) == expected, (query, filter_term)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_lexical_search_results_score(self, config, index_name):
        docs = [
            {"_id": "11", "text_field_1": "field_1_document_1"},
            {"_id": "12", "text_field_1": "field_1_document_2"},
            {"_id": "21", "text_field_2": "field_2_document_1"},
            {"_id": "22", "text_field_2": "field_2_document_2"},
        ]
        tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name, docs=docs,
            tensor_fields=["text_field_1", "text_field_2"]
            if index_name == UNSTRUCTURED else None))
        res = tensor_search.search(config, index_name,
                                   text="field_1_document_1",
                                   search_method="LEXICAL", limit=10)
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "11"
        assert res["hits"][0]["_score"] > 0
        res = tensor_search.search(config, index_name,
                                   text="field_2_document_1",
                                   search_method="LEXICAL", limit=10)
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "21"
        assert res["hits"][0]["_score"] > 0

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_lexical_escaped_quotes(self, config, index_name):
        docs = [
            {"_id": "doc1", "text_field_1": '1"2'},
            {"_id": "doc2", "text_field_1": "exact match"},
            {"_id": "doc3", "text_field_1": "exacto wrong syntax"},
            {"_id": "doc4", "text_field_1": '"escaped"'},
            {"_id": "red_herring_1", "text_field_1": "12"},
            {"_id": "red_herring_2", "text_field_1": "escaped"},
            {"_id": "red_herring_3", "text_field_1": 'wrong"'},
        ]
        tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name, docs=docs,
            tensor_fields=["text_field_1"]
            if index_name == UNSTRUCTURED else None))
        cases = [
            ('1\\"2', ["doc1"]),
            ('"exact match"', ["doc2"]),
            ('\\"escaped\\"', ["doc4", "red_herring_2"]),
            ('"exacto" wrong"', ["doc3"]),
            ('""', []),
            ('"', []),
            ("", []),
        ]
        for query, expected_ids in cases:
            res = tensor_search.search(config, index_name, text=query,
                                       search_method="LEXICAL")
            assert {h["_id"] for h in res["hits"]} == set(expected_ids), query


class TestSearchMethodValidation:
    def test_invalid_search_method(self, config):
        for bad in ("", 1, [], {"searchMethod": "LEXICAL"}):
            with pytest.raises(api_exceptions.InvalidArgError):
                tensor_search.search(config, UNSTRUCTURED, text="test",
                                     search_method=bad)

    def test_case_insensitive_methods(self, config):
        tensor_search.add_documents(config, AddDocsParams(
            index_name=UNSTRUCTURED, docs=[{"_id": "1", "t": "hello"}],
            tensor_fields=["t"]))
        for method in ("lexical", "teNsor", "TENSOR", "LEXICAL"):
            res = tensor_search.search(config, UNSTRUCTURED, text="hello",
                                       search_method=method)
            assert "hits" in res

    def test_vectorise_called_with_enable_cache_true(self, config,
                                                     monkeypatch):
        calls = {}
        real = inference.vectorise

        def spy(*args, **kwargs):
            calls.update(kwargs)
            return real(*args, **kwargs)

        monkeypatch.setattr(tensor_search.inference, "vectorise", spy)
        tensor_search.search(config, UNSTRUCTURED, text="some text")
        assert calls.get("enable_cache") is True
