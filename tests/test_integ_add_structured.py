"""Ported reference integ tests: add-documents on STRUCTURED indexes.

Source:
/root/reference/tests/tensor_search/integ_tests/test_add_documents_structured.py
(network-free subset; image tests use local PNG files instead of the
hosted hippo URL): plain/encoded index names, boolean fields, dupe ids
with facet equality, validation matrices on declared field types,
resilient per-item validation, doc-size caps, numeric long/double range
matrix, fp32 rounding edge cases, non-image content on image fields.
"""

import numpy as np
import pytest
from PIL import Image

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX_1 = "ads-main"
INDEX_2 = "a-b_encoded"  # reference: name with - and _
INDEX_IMG = "ads-img-random"

FIELDS = [
    FieldRequest(name="title", type=FieldType.Text),
    FieldRequest(name="desc", type=FieldType.Text,
                 features=[FieldFeature.LexicalSearch]),
    FieldRequest(name="tags", type=FieldType.ArrayText,
                 features=[FieldFeature.Filter, FieldFeature.LexicalSearch]),
    FieldRequest(name="price", type=FieldType.Float,
                 features=[FieldFeature.ScoreModifier]),
    FieldRequest(name="in_stock", type=FieldType.Bool,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="int_field_1", type=FieldType.Int,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="float_field_1", type=FieldType.Float,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="long_field_1", type=FieldType.Long,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="double_field_1", type=FieldType.Double,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="array_long_field_1", type=FieldType.ArrayLong,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="array_double_field_1", type=FieldType.ArrayDouble,
                 features=[FieldFeature.Filter]),
    FieldRequest(name="map_float_field_1", type=FieldType.MapFloat,
                 features=[FieldFeature.ScoreModifier]),
]


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    for name in (INDEX_1, INDEX_2):
        cfg.index_management.create_index(IndexSettings(
            type=IndexType.Structured, model="test", allFields=FIELDS,
            tensorFields=["title"]).to_marqo_index(name))
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="random",
        allFields=[
            FieldRequest(name="title", type=FieldType.Text),
            FieldRequest(name="desc", type=FieldType.Text,
                         features=[FieldFeature.LexicalSearch]),
            FieldRequest(name="location", type=FieldType.ImagePointer)],
        tensorFields=["title", "location"],
    ).to_marqo_index(INDEX_IMG))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


@pytest.fixture
def local_image(tmp_path):
    p = tmp_path / "hippo.png"
    Image.new("RGB", (64, 48), color=(120, 100, 80)).save(p)
    return str(p)


def _add(config, index_name, docs, **kw):
    return tensor_search.add_documents(config, AddDocsParams(
        index_name=index_name, docs=docs, **kw))


class TestAddDocumentsStructured:
    def test_add_plain_id_field(self, config):
        """Reference test_add_plain_id_field: plain id works on standard
        and encoding-requiring index names."""
        for index_name in (INDEX_1, INDEX_2):
            res = _add(config, index_name, [{
                "_id": "123", "title": "content 1",
                "desc": "content 2. blah blah blah"}])
            assert res["errors"] is False, res
            assert tensor_search.get_document_by_id(
                config, index_name, "123") == {
                    "_id": "123", "title": "content 1",
                    "desc": "content 2. blah blah blah"}

    def test_boolean_field(self, config):
        """Reference test_boolean_field: True/False/absent booleans round
        trip exactly — a blank boolean stays blank, no default fill."""
        cases = [{"_id": "123", "in_stock": True},
                 {"_id": "124", "in_stock": False},
                 {"_id": "125"}]
        for index_name in (INDEX_1, INDEX_2):
            for doc in cases:
                res = _add(config, index_name, [doc])
                assert res["errors"] is False, res
                assert tensor_search.get_document_by_id(
                    config, index_name, doc["_id"]) == doc

    def test_add_documents_dupe_ids(self, config):
        """Reference test_add_documents_dupe_ids: only the latest doc for
        an id is returned, and identical content produces identical
        tensor facets."""
        res = _add(config, INDEX_1, [{"_id": "1", "title": "doc 123"}])
        assert res["errors"] is False
        facets = tensor_search.get_document_by_id(
            config, INDEX_1, "1", show_vectors=True)["_tensor_facets"]
        _add(config, INDEX_1, [{"_id": "2", "title": "doc 000"}])
        _add(config, INDEX_1, [{"_id": "2", "title": "doc 123"}])
        actual = tensor_search.get_document_by_id(
            config, INDEX_1, "2", show_vectors=True)
        assert actual == {"_id": "2", "title": "doc 123",
                          "_tensor_facets": facets}

    def test_add_documents_with_missing_index_fails(self, config):
        with pytest.raises((IndexNotFoundError,
                            api_exceptions.IndexNotFoundError)):
            _add(config, "no-such-index-xyz", [{"abc": "def"}])

    def test_add_documents_whitespace(self, config):
        """Reference test_add_documents_whitespace: whitespace-only
        fields index fine; all 7 docs land."""
        docs = [{"title": ""}, {"title": " "}, {"title": "  "},
                {"title": "\r"}, {"title": "\r "}, {"title": "\r\r"},
                {"title": "\r\t\n"}]
        res = _add(config, INDEX_1, docs)
        assert res["errors"] is False, res
        index = config.index_meta_cache.get_index(INDEX_1)
        assert config.engine.doc_count(index.schema_name) == len(docs)

    def test_add_docs_response_format(self, config):
        res = _add(config, INDEX_1, [
            {"_id": "123", "title": "content 1", "desc": "blah"},
            {"_id": "456", "title": "content 1", "desc": "blah"},
            {"_id": "789", "tags": [1, "str"]},  # mixed types, error
        ])
        assert "errors" in res and "processingTimeMs" in res
        assert "index_name" in res and "items" in res
        assert res["processingTimeMs"] > 0
        assert res["errors"] is True
        assert res["index_name"] == INDEX_1
        for item in res["items"]:
            assert "_id" in item and "status" in item
            assert (item["status"] == 200) ^ (
                "error" in item and "code" in item)
        assert [item["status"] for item in res["items"]] == [200, 200, 400]

    @pytest.mark.parametrize("use_existing", [True, False])
    def test_add_documents_validation(self, config, use_existing):
        """Reference test_add_documents_validation: invalid values on
        declared structured types fail per-item, valid siblings pass."""
        bad_doc_args = [
            [{"_id": "to_fail_123", "title": dict()}],
            [{"_id": "to_fail_123", "title": ["wow", "this", "is"]}],
            [{"_id": "to_fail_123", "title": ["wow", "this", "is"]},
             {"_id": "to_pass_123", "title": "some_content"}],
            [{"_id": "to_fail_123", "tags": [{"abc": "678"}]}],
            [{"_id": "to_fail_123", "title": {"abc": "234"}}],
            [{"_id": "to_fail_123", "title": {"abc": "234"}},
             {"_id": "to_pass_123", "title": "some_content"}],
            [{"title": {1243}, "_id": "to_fail_123"}],  # set: invalid json
            [{"title": None, "_id": "to_fail_123"}],
            [{"_id": "to_fail_123", "title": [None], "desc": "123"},
             {"_id": "to_fail_567", "title": "finnne", 123: "heehee"}],
            [{"_id": "to_fail_123", "title": [None], "desc": "123"},
             {"_id": "to_fail_567", "title": AssertionError}],
            [{"_id": "to_fail_567", "tags": max}],
        ]
        for bad_doc_arg in bad_doc_args:
            res = _add(config, INDEX_1, bad_doc_arg,
                       use_existing_tensors=use_existing)
            assert res["errors"] is True, bad_doc_arg
            assert all("error" in item for item in res["items"]
                       if str(item.get("_id", "")).startswith("to_fail"))
            assert all(item["status"] == 200 for item in res["items"]
                       if str(item.get("_id", "")).startswith("to_pass"))

    @pytest.mark.parametrize("use_existing", [True, False])
    def test_add_documents_id_validation(self, config, use_existing):
        bad_doc_args = [
            ([{"_id": {}, "title": "yyy"}], 0),
            ([{"_id": [1, 2, 3], "title": "yyy"}], 0),
            ([{"_id": 4, "title": "yyy"}], 0),
            ([{"_id": None, "title": "yyy"}], 0),
            ([{"_id": "proper id", "title": "yyy"},
              {"_id": ["bad", "id"], "title": "zzz"},
              {"_id": "proper id 2", "title": "xxx"}], 2),
        ]
        for docs, expected_ok in bad_doc_args:
            res = _add(config, INDEX_1, docs,
                       use_existing_tensors=use_existing)
            assert res["errors"] is True
            ok = 0
            for item in res["items"]:
                if item["status"] == 200:
                    ok += 1
                else:
                    assert "Document _id must be a string type" in \
                        item["error"]
            assert ok == expected_ok, docs

    def test_add_documents_list_success(self, config):
        res = _add(config, INDEX_1,
                   [{"_id": "124", "tags": ["wow", "this", "is"]}])
        assert res["errors"] is False

    def test_add_documents_list_data_type_validation(self, config):
        bad_doc_args = [
            [{"_id": "to_fail_123", "tags": ["wow", "this", False]}],
            [{"_id": "to_fail_124", "tags": [1, None, 3]}],
            [{"_id": "to_fail_125", "tags": [{}]}],
        ]
        for bad_doc_arg in bad_doc_args:
            res = _add(config, INDEX_1, bad_doc_arg)
            assert res["errors"] is True, bad_doc_arg
            assert all("error" in item for item in res["items"]
                       if item["_id"].startswith("to_fail"))

    def test_add_documents_empty(self, config):
        """Reference test_add_documents_empty: [] raises BadRequestError."""
        with pytest.raises(api_exceptions.BadRequestError):
            _add(config, INDEX_1, [])

    def test_add_documents_id_image_url(self, config, local_image,
                                        monkeypatch):
        """Reference test_add_documents_id_image_url: an _id that looks
        like an image pointer is never opened as an image."""
        opened = []
        real_open = Image.open
        monkeypatch.setattr(
            Image, "open", lambda *a, **k: opened.append(a) or
            real_open(*a, **k))
        res = _add(config, INDEX_IMG,
                   [{"_id": local_image, "title": "wow"}])
        assert res["errors"] is False, res
        assert opened == []

    def test_add_documents_resilient_doc_validation(self, config):
        """Reference test_add_documents_resilient_doc_validation: the
        full per-item matrix — empty dicts, non-dict docs, bad field
        names, reserved names, bad content, bad ids."""
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
            ([{"__chunks": "bad"},
              {"_id": "1511", "__vector_a": "some content"},
              {"_id": "cool"},
              {"_id": "144451", "__field_content": "some content"}],
             [(None, 400), ("1511", 400), ("cool", 200),
              ("144451", 400)]),
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
            ([{"title": dict(), "_id": "12345"}, {"_id": "cool"}],
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
            res = _add(config, INDEX_1, docs)
            assert len(res["items"]) == len(expected), (docs, res)
            for i, item in enumerate(res["items"]):
                if expected[i][0] is not None:
                    assert item["_id"] == expected[i][0], (docs, res)
                assert item["status"] == expected[i][1], (docs, res)

    def test_add_document_with_tensor_fields(self, config):
        """Reference test_add_document_with_tensor_fields: only declared
        tensor fields ('title') produce facets."""
        _add(config, INDEX_1, [{"_id": "789",
                                "title": "Story of Alice Appleseed",
                                "desc": "Alice grew up in Houston."}])
        resp = tensor_search.get_document_by_id(
            config, INDEX_1, "789", show_vectors=True)
        assert len(resp["_tensor_facets"]) == 1
        assert "_embedding" in resp["_tensor_facets"][0]
        assert "title" in resp["_tensor_facets"][0]
        assert "desc" not in resp["_tensor_facets"][0]

    def test_doc_too_large(self, config, monkeypatch):
        max_size = 400000
        monkeypatch.setenv("MARQO_MAX_DOC_BYTES", str(max_size))
        res = _add(config, INDEX_1, [
            {"_id": "123", "desc": "edf " * (max_size // 4)},
            {"_id": "789", "desc": "abc " * ((max_size // 4) - 500)},
            {"_id": "456", "desc": "exc " * (max_size // 4)},
        ])
        assert res["errors"] is True
        items = res["items"]
        assert "error" in items[0] and "error" in items[2]
        assert items[0]["code"] == "doc_too_large"
        assert items[2]["code"] == "doc_too_large"
        assert items[1]["status"] == 200 and "error" not in items[1]

    def test_doc_too_large_single_doc(self, config, monkeypatch):
        max_size = 400000
        monkeypatch.setenv("MARQO_MAX_DOC_BYTES", str(max_size))
        res = _add(config, INDEX_1,
                   [{"_id": "123", "desc": "edf " * (max_size // 4)}],
                   use_existing_tensors=True)
        assert res["errors"] is True
        assert res["items"][0]["code"] == "doc_too_large"

    def test_doc_too_large_none_env_var(self, config):
        """No MARQO_MAX_DOC_BYTES -> default applies, small doc passes."""
        res = _add(config, INDEX_1,
                   [{"_id": "123", "desc": "Some content"}],
                   use_existing_tensors=True)
        assert res["errors"] is False
        assert res["items"][0]["status"] == 200

    def test_add_documents_exceeded_max_doc_count(self, config,
                                                  monkeypatch):
        max_docs = 128
        monkeypatch.setenv("MARQO_MAX_ADD_DOCS_COUNT", str(max_docs))
        for count, error in [(max_docs - 10, False), (max_docs - 1, False),
                             (max_docs, False), (max_docs + 1, True),
                             (max_docs + 10, True)]:
            if error:
                with pytest.raises(api_exceptions.BadRequestError):
                    _add(config, INDEX_1, [{"desc": "some desc"}] * count)
            else:
                res = _add(config, INDEX_1,
                           [{"desc": "some desc"}] * count)
                assert res["errors"] is False

    def test_remove_tensor_field(self, config):
        """Reference test_remove_tensor_field: re-indexing without the
        tensor field removes its vectors."""
        _add(config, INDEX_1, [{"_id": "123", "title": "mydata",
                                "desc": "mydata2"}])
        _add(config, INDEX_1, [{"_id": "123", "desc": "mydata"}])
        doc = tensor_search.get_document_by_id(
            config, INDEX_1, "123", show_vectors=True)
        assert doc["_tensor_facets"] == []
        assert "title" not in doc

    def test_no_tensor_field_on_empty_ix(self, config):
        _add(config, INDEX_1, [{"_id": "123", "desc": "mydata"}])
        doc = tensor_search.get_document_by_id(
            config, INDEX_1, "123", show_vectors=True)
        assert doc["_tensor_facets"] == []
        assert "desc" in doc

    def test_index_doc_on_empty_ix(self, config):
        _add(config, INDEX_1, [{"_id": "123", "title": "mydata",
                                "desc": "mydata"}])
        doc = tensor_search.get_document_by_id(
            config, INDEX_1, "123", show_vectors=True)
        assert len(doc["_tensor_facets"]) == 1
        assert "title" in doc["_tensor_facets"][0]
        assert "desc" not in doc["_tensor_facets"][0]
        assert "title" in doc and "desc" in doc

    def test_various_image_count(self, config, local_image):
        """Reference test_various_image_count on the model='random'
        image index (local file instead of the hosted hippo URL)."""
        import functools
        import math

        def check(doc_count):
            approx_half = math.floor(doc_count / 2)
            got = tensor_search.get_documents_by_ids(
                config, INDEX_IMG,
                [str(n) for n in (0, approx_half, doc_count - 1)],
                show_vectors=True)
            for d in got["results"]:
                assert d["_found"] is True
                assert d["title"] == "blah"
                assert d["location"] == local_image
                keys = functools.reduce(
                    lambda x, y: x.union(y),
                    [set(facet.keys()) for facet in d["_tensor_facets"]],
                    set())
                assert keys == {"_embedding", "location", "title"}
                for facet in d["_tensor_facets"]:
                    if "location" in facet:
                        assert facet["location"] == local_image
                    elif "title" in facet:
                        assert facet["title"] == "blah"
                    assert isinstance(facet["_embedding"], list)
                    assert len(facet["_embedding"]) > 0

        for c in (1, 2, 25):
            res = _add(config, INDEX_IMG,
                       [{"_id": str(n), "location": local_image,
                         "title": "blah"} for n in range(c)])
            assert res["errors"] is False, res
            stats = config.monitoring.get_index_stats(INDEX_IMG)
            assert stats["numberOfDocuments"] == c
            check(c)
            tensor_search.delete_documents(
                config, INDEX_IMG, [str(n) for n in range(c)])

    def test_add_long_double_numeric_values(self, config):
        """Reference test_add_long_double_numeric_values: int is int32
        (min -2147483647 for filtering), long is int64, float is fp32
        range, double takes what float can't."""
        test_case = [
            ({"_id": "1", "int_field_1": 2147483647}, False),
            ({"_id": "2", "int_field_1": -2147483647}, False),
            ({"_id": "3", "int_field_1": 2147483648}, True),
            ({"_id": "4", "long_field_1": 2147483648}, False),
            ({"_id": "5", "int_field_1": -2147483648}, True),
            ({"_id": "6", "long_field_1": -2147483648}, False),
            ({"_id": "7", "float_field_1": 3.4028235e38}, False),
            ({"_id": "8", "float_field_1": -3.4028235e38}, False),
            ({"_id": "9", "float_field_1": 3.4028235e40}, True),
            ({"_id": "10", "double_field_1": 3.4028235e40}, False),
            ({"_id": "13", "long_field_1": 1}, False),
            ({"_id": "14", "long_field_1": -1}, False),
            ({"_id": "15", "long_field_1": 100232142864}, False),
            ({"_id": "16", "long_field_1": -923217213}, False),
            ({"_id": "17", "long_field_1": int("1" * 50)}, True),
            ({"_id": "18", "long_field_1": -1 * int("1" * 50)}, True),
            ({"_id": "19", "double_field_1": 1e10}, False),
            ({"_id": "20", "double_field_1": -1e12}, False),
            ({"_id": "21", "double_field_1": 1e10 + 0.123249357987123},
             False),
            ({"_id": "22", "double_field_1": -1e10 + 0.123249357987123},
             False),
            ({"_id": "23",
              "array_double_field_1": [1e10, 1e10 + 0.123249357987123]},
             False),
        ]
        for doc, error in test_case:
            res = _add(config, INDEX_1, [doc])
            assert res["errors"] is error, (doc, res)
            if error:
                assert "Invalid value" in res["items"][0]["error"], res
            else:
                returned = tensor_search.get_document_by_id(
                    config, INDEX_1, doc["_id"])
                assert returned == doc

    def test_long_double_numeric_values_edge_case(self, config):
        """Reference edge case: tiny floats round to 0 in fp32 storage."""
        for doc, expected in [
                ({"_id": "1", "float_field_1": 1e-50},
                 {"_id": "1", "float_field_1": 0}),
                ({"_id": "2", "float_field_1": -1e-50},
                 {"_id": "2", "float_field_1": 0}),
                # map<text, float> values are fp32 cells too
                ({"_id": "3", "map_float_field_1": {"a": 1e-50}},
                 {"_id": "3", "map_float_field_1": {"a": 0}})]:
            res = _add(config, INDEX_1, [doc])
            assert res["errors"] is False, res
            returned = tensor_search.get_document_by_id(
                config, INDEX_1, doc["_id"])
            assert returned == expected

    def test_add_documents_non_image_content_for_image_field(self, config):
        """Reference test_add_documents_nonImageContentForAnImageField:
        every doc fails 400 with the media-file wording."""
        documents = [
            {"_id": "1", "location": "this is not an image/url/path",
             "title": "A image field with non-image content"},
            {"_id": "2", "location": "this is not an image/url/path/2",
             "title": "A document with invalid image field"},
            {"_id": "3", "location": "this is not an image/url/path/3",
             "title": "Another one"},
        ]
        res = _add(config, INDEX_IMG, documents)
        assert res["errors"] is True
        assert len(res["items"]) == 3
        for item in res["items"]:
            assert item["status"] == 400, res
            assert "Could not process the media file found at" in \
                item["error"], item
