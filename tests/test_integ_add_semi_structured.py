"""Ported reference integ tests: add-documents on semi-structured indexes.

Source:
/root/reference/tests/tensor_search/integ_tests/test_add_documents_semi_structured.py
(network-free subset): id/field validation matrices, response format,
dupe-id semantics (across batches and within one batch), doc-size caps,
tensor-field removal on reindex, large-number handling, empty requests.
"""

import numpy as np
import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "ass-index"


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


def _add(cfg, docs, tensor_fields=("title",), **kwargs):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=list(docs),
        tensor_fields=list(tensor_fields), **kwargs))


class TestAddBasics:
    def test_add_plain_id_field(self, config):
        _add(config, [{"_id": "123", "title": "content 1",
                       "desc": "content 2. blah blah blah"}])
        doc = tensor_search.get_document_by_id(config, INDEX, "123")
        assert doc == {"_id": "123", "title": "content 1",
                       "desc": "content 2. blah blah blah"}

    def test_add_documents_dupe_ids(self, config):
        """Only the latest added document wins; identical content yields
        identical tensor facets."""
        _add(config, [{"_id": "1", "title": "doc 123"}])
        facets = tensor_search.get_document_by_id(
            config, INDEX, "1", show_vectors=True)["_tensor_facets"]
        _add(config, [{"_id": "2", "title": "doc 000"}])
        _add(config, [{"_id": "2", "title": "doc 123"}])
        doc = tensor_search.get_document_by_id(config, INDEX, "2",
                                               show_vectors=True)
        assert doc == {"_id": "2", "title": "doc 123",
                       "_tensor_facets": facets}

    def test_add_documents_with_missing_index_fails(self, config):
        with pytest.raises(IndexNotFoundError):
            tensor_search.add_documents(config, AddDocsParams(
                index_name="ghost-missing-index",
                docs=[{"title": "x"}], tensor_fields=["title"]))

    def test_add_documents_empty(self, config):
        # reference add_docs_params.py:85 raises BadRequestError straight
        # from the AddDocsParams validator
        with pytest.raises(api_exceptions.BadRequestError):
            _add(config, [])

    def test_add_docs_response_format(self, config):
        res = _add(config, [
            {"_id": "123", "title": "content 1", "desc": "blah"},
            {"_id": "456", "title": "content 1", "desc": "blah"},
            {"_id": "789", "tags": [1, "str"]},  # mixed types → error
        ], tensor_fields=[])
        assert "errors" in res and "processingTimeMs" in res
        assert "index_name" in res and "items" in res
        assert res["processingTimeMs"] > 0
        assert res["errors"] is True
        assert res["index_name"] == INDEX
        for item in res["items"]:
            assert "_id" in item and "status" in item
            assert (item["status"] == 200) ^ ("error" in item
                                              and "code" in item)
        assert [i["status"] for i in res["items"]] == [200, 200, 400]


class TestAddValidation:
    BAD_DOC_ARGS = [
        [{"_id": "to_fail_123", "title": {"abc": 234}}],  # dict w/ int val
        [{"_id": "to_fail_123", "title": {"abc": 234}},
         {"_id": "to_pass_123", "title": "some_content"}],
        [{"_id": "to_fail_123", "tags": [{"abc": "678"}]}],  # list of dict
        [{"title": None, "_id": "to_fail_123"}],
        [{"_id": "to_fail_123", "title": [None], "desc": "123"},
         {"_id": "to_fail_567", "title": "finnne", 123: "heehee"}],
    ]

    @pytest.mark.parametrize("use_existing", [True, False])
    def test_add_documents_validation(self, config, use_existing):
        for bad_docs in self.BAD_DOC_ARGS:
            res = _add(config, bad_docs,
                       use_existing_tensors=use_existing)
            assert res["errors"] is True, bad_docs
            for item in res["items"]:
                if item["_id"].startswith("to_fail"):
                    assert "error" in item, (bad_docs, item)
                if item["_id"].startswith("to_pass"):
                    assert item["status"] == 200

    ID_CASES = [
        ([{"_id": {}, "title": "yyy"}], 0),
        ([{"_id": [1, 2, 3], "title": "yyy"}], 0),
        ([{"_id": 4, "title": "yyy"}], 0),
        ([{"_id": None, "title": "yyy"}], 0),
        ([{"_id": "proper id", "title": "yyy"},
          {"_id": ["bad", "id"], "title": "zzz"},
          {"_id": "proper id 2", "title": "xxx"}], 2),
    ]

    @pytest.mark.parametrize("use_existing", [True, False])
    def test_add_documents_id_validation(self, config, use_existing):
        for docs, expected_ok in self.ID_CASES:
            res = _add(config, docs, use_existing_tensors=use_existing)
            assert res["errors"] is True, docs
            ok = 0
            for item in res["items"]:
                if item["status"] == 200:
                    ok += 1
                else:
                    assert "Document _id must be a string type" in \
                        item["error"]
            assert ok == expected_ok, docs

    def test_add_documents_list_success(self, config):
        res = _add(config, [{"_id": "ok", "tags": ["wow", "this", "is"]}],
                   tensor_fields=[])
        assert res["errors"] is False

    def test_add_documents_list_data_type_validation(self, config):
        for docs in ([{"_id": "to_fail_123", "tags": ["wow", "this",
                                                      False]}],
                     [{"_id": "to_fail_124", "tags": [1, None, 3]}],
                     [{"_id": "to_fail_125", "tags": [{}]}]):
            res = _add(config, docs, tensor_fields=[])
            assert res["errors"] is True, docs
            assert "error" in res["items"][0]


class TestDocSizeAndCounts:
    def test_doc_too_large(self, config, monkeypatch):
        max_size = 400000
        monkeypatch.setenv("MARQO_MAX_DOC_BYTES", str(max_size))
        res = _add(config, [
            {"_id": "123", "desc": "edf " * (max_size // 4)},
            {"_id": "789", "desc": "abc " * ((max_size // 4) - 500)},
            {"_id": "456", "desc": "exc " * (max_size // 4)},
        ], tensor_fields=["desc"])
        items = res["items"]
        assert res["errors"] is True
        assert "error" in items[0] and "error" in items[2]
        assert items[0]["code"] == "doc_too_large"
        assert items[2]["code"] == "doc_too_large"
        assert items[1]["status"] == 200
        assert "error" not in items[1]

    def test_exceeded_max_doc_count(self, config, monkeypatch):
        monkeypatch.setenv("MARQO_MAX_ADD_DOCS_COUNT", "4")
        # reference add_docs_params.py:86-93: over-limit is a
        # BadRequestError from the AddDocsParams validator
        with pytest.raises(api_exceptions.BadRequestError):
            _add(config, [{"title": f"d{i}"} for i in range(5)])
        res = _add(config, [{"title": f"d{i}"} for i in range(4)])
        assert res["errors"] is False

    def test_remove_tensor_field(self, config):
        """Re-indexing with the tensor field removed drops the vectors."""
        _add(config, [{"_id": "123", "title": "mydata",
                       "desc": "mydata2"}])
        _add(config, [{"_id": "123", "desc": "mydata"}], tensor_fields=[])
        doc = tensor_search.get_document_by_id(config, INDEX, "123",
                                               show_vectors=True)
        assert doc["_tensor_facets"] == []
        assert "title" not in doc


class TestNumbersAndDuplicates:
    @pytest.mark.parametrize("doc,expect_error", [
        ({"long_field_1": 1}, False),
        ({"long_field_1": -1}, False),
        ({"long_field_1": -100232142002}, False),
        ({"long_field_1": int("1" * 50)}, True),
        ({"long_field_1": -1 * int("1" * 50)}, True),
        ({"double_field_1": 1e10}, False),
        ({"double_field_1": -1e12}, False),
        ({"double_field_1": 1e10 + 0.123249357987123}, False),
    ])
    def test_large_integer_and_float(self, config, doc, expect_error):
        res = _add(config, [doc], tensor_fields=[])
        assert res["errors"] is expect_error, (doc, res)

    def test_duplicate_ids_in_one_batch(self, config):
        """Last duplicate wins; only ONE response item per id; an invalid
        last duplicate still supersedes the valid earlier one."""
        cases = [
            ([{"_id": "1", "text_field": "test 1"},
              {"_id": "1", "text_field": "test 2"}], 1),
            ([{"_id": "1", "text_field": "test 1"},
              {"_id": "1", "text_field::": "test 2"}], 0),
            ([{"_id": "1", "text_field::": "test 2"},
              {"_id": "1", "text_field": "test 1"}], 1),
        ]
        for docs, expected_count in cases:
            tensor_search.delete_documents(config, INDEX, ["1"])
            res = _add(config, docs, tensor_fields=["text_field"])
            assert len(res["items"]) == 1, docs
            stats = config.monitoring.get_index_stats(INDEX)
            assert stats["numberOfDocuments"] == expected_count, docs


class TestUnstructuredResiduals:
    """Round-4 additions (reference test_add_documents_unstructured.py:
    177-200, 405-475, 695-710): whitespace docs, tensor_fields
    requiredness, the full resilient per-item matrix — note `__chunks`-
    style field names are VALID on unstructured (the schema prefixes
    internals with `marqo__`, so plain `__...` user fields don't clash),
    unlike structured where they 400."""

    def test_add_documents_whitespace(self, config):
        docs = [{"title": ""}, {"title": " "}, {"title": "  "},
                {"title": "\r"}, {"title": "\r "}, {"title": "\r\r"},
                {"title": "\r\t\n"}]
        res = _add(config, docs, tensor_fields=[])
        assert res["errors"] is False, res
        index = config.index_meta_cache.get_index(INDEX)
        assert config.engine.doc_count(index.schema_name) >= len(docs)

    def test_bad_tensor_fields(self, config):
        cases = [
            ({"tensor_fields": None},
             "tensor_fields must be explicitly provided"),
            ({}, "tensor_fields must be explicitly provided"),
            ({"tensor_fields": ["_id", "some"]},
             "`_id` field cannot be a tensor field"),
        ]
        for kwargs, error_message in cases:
            with pytest.raises(Exception) as exc:
                tensor_search.add_documents(config, AddDocsParams(
                    index_name=INDEX, docs=[{"some": "data"}], **kwargs))
            assert error_message in str(exc.value), kwargs

    def test_add_documents_resilient_doc_validation(self, config):
        docs_results = [
            ([{"_id": "123", "title": "legitimate text"}, {},
              {"_id": "456", "title": "awesome stuff!"}],
             [("123", 200), (None, 400), ("456", 200)]),
            ([{}], [(None, 400)]),
            ([{}, {}], [(None, 400), (None, 400)]),
            ([{}, {}, {"title": "yep"}],
             [(None, 400), (None, 400), (None, 200)]),
            ([{"this is a set, lmao"}, "this is a string",
              {"title": "yep"}],
             [(None, 400), (None, 400), (None, 200)]),
            ([1234], [(None, 400)]),
            ([None], [(None, 400)]),
            ([{123: "bad"}, {"_id": "cool"}],
             [(None, 400), ("cool", 200)]),
            # reference :423-426 — double-underscore names all succeed on
            # unstructured
            ([{"__chunks": "bad"},
              {"_id": "1511", "__vector_a": "some content"},
              {"_id": "cool"},
              {"_id": "144451", "__field_content": "some content"}],
             [(None, 200), ("1511", 200), ("cool", 200),
              ("144451", 200)]),
            ([{123: "bad", "_id": "12345"}, {"_id": "cool"}],
             [("12345", 400), ("cool", 200)]),
            ([{None: "bad", "_id": "12345"}, {"_id": "cool"}],
             [("12345", 400), ("cool", 200)]),
            ([{"title": None, "_id": "12345"}, {"_id": "cool"}],
             [(None, 400), ("cool", 200)]),
            ([{"tags": [1, 2, "3", 4], "_id": "12345"}, {"_id": "cool"}],
             [("12345", 400), ("cool", 200)]),
            ([{"title": ("cat", "dog"), "_id": "12345"}, {"_id": "cool"}],
             [("12345", 400), ("cool", 200)]),
            ([{"title": set(), "_id": "12345"}, {"_id": "cool"}],
             [(None, 400), ("cool", 200)]),
            ([{"bad": "hehehe", "_id": 12345}, {"_id": "cool"}],
             [(None, 400), ("cool", 200)]),
            ([{"bad": "hehehe", "_id": 12345}, {"_id": "cool"},
              {"bad": "hehehe", "_id": None}, {"title": "yep"},
              {"_id": (1, 2), "efgh": "abc"},
              {"_id": 1.234, "cool": "wowowow"}],
             [(None, 400), ("cool", 200), (None, 400), (None, 200),
              (None, 400), (None, 400)]),
            ([{(1, 2, 3): set(), "_id": "12345"}, {"_id": "cool"},
              {"tags": [1, 2, 3], "_id": None}, {"title": "yep"}, {},
              "abcdefgh"],
             [(None, 400), ("cool", 200), (None, 400), (None, 200),
              (None, 400), (None, 400)]),
        ]
        for docs, expected in docs_results:
            res = _add(config, docs, tensor_fields=[])
            assert len(res["items"]) == len(expected), (docs, res)
            for i, item in enumerate(res["items"]):
                if expected[i][0] is not None:
                    assert item["_id"] == expected[i][0], (docs, res)
                assert item["status"] == expected[i][1], (docs, res)

    def test_add_document_with_tensor_fields(self, config):
        """tensor_fields=['title'] embeds title but not desc."""
        _add(config, [{"_id": "789", "title": "Story of Alice Appleseed",
                       "desc": "Alice grew up in Houston, Texas."}],
             tensor_fields=["title"])
        resp = tensor_search.get_document_by_id(
            config, INDEX, "789", show_vectors=True)
        assert len(resp["_tensor_facets"]) == 1
        assert "_embedding" in resp["_tensor_facets"][0]
        assert "title" in resp["_tensor_facets"][0]
        assert "desc" not in resp["_tensor_facets"][0]
