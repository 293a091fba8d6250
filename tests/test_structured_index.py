"""Structured-index end-to-end: declared fields, feature enforcement,
partial updates, settings rendering."""

import pytest

from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search


def _structured_settings():
    return IndexSettings(
        type=IndexType.Structured,
        model="test",
        allFields=[
            FieldRequest(name="title", type=FieldType.Text,
                         features=[FieldFeature.LexicalSearch]),
            FieldRequest(name="description", type=FieldType.Text,
                         features=[FieldFeature.LexicalSearch,
                                   FieldFeature.Filter]),
            FieldRequest(name="price", type=FieldType.Float,
                         features=[FieldFeature.Filter,
                                   FieldFeature.ScoreModifier]),
            FieldRequest(name="tags", type=FieldType.ArrayText,
                         features=[FieldFeature.Filter]),
        ],
        tensorFields=["title", "description"],
    )


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        _structured_settings().to_marqo_index("s-index"))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


DOCS = [
    {"_id": "d1", "title": "red apple", "description": "a tasty fruit",
     "price": 3.5, "tags": ["fruit"]},
    {"_id": "d2", "title": "fast car", "description": "a quick vehicle",
     "price": 30000.0, "tags": ["vehicle"]},
]


def _add(cfg, docs=DOCS):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name="s-index", docs=docs))


class TestStructuredIndex:
    def test_add_and_search(self, config):
        res = _add(config)
        assert res["errors"] is False, res["items"]
        out = tensor_search.search(config, "s-index", text="tasty fruit")
        assert out["hits"][0]["_id"] == "d1"

    def test_undeclared_field_rejected(self, config):
        res = _add(config, docs=[{"_id": "x", "mystery": "nope"}])
        assert res["errors"] is True
        assert res["items"][0]["status"] == 400

    def test_tensor_fields_param_rejected(self, config):
        # request-level 400 before any per-doc processing (reference
        # structured_add_document_handler.py:48-51), not error items
        # inside a 200
        from marqo_tpu.core.exceptions import InvalidArgumentError
        params = AddDocsParams(index_name="s-index", docs=DOCS,
                               tensor_fields=["title"])
        with pytest.raises(InvalidArgumentError, match="tensorFields"):
            tensor_search.add_documents(config, params)

    def test_filterable_fields_enforced_in_search(self, config):
        _add(config)
        out = tensor_search.search(config, "s-index", text="thing",
                                   filter="price:[0 TO 100]")
        assert [h["_id"] for h in out["hits"]] == ["d1"]

    def test_settings_roundtrip(self, config):
        rendered = IndexSettings.from_marqo_index(
            config.index_management.get_index("s-index"))
        assert rendered["type"] == "structured"
        assert {f["name"] for f in rendered["allFields"]} == \
            {"title", "description", "price", "tags"}
        assert rendered["tensorFields"] == ["title", "description"]

    def test_partial_update(self, config):
        _add(config)
        res = config.document.partial_update_documents_by_index_name(
            "s-index", [{"_id": "d1", "price": 4.0}])
        assert res["errors"] is False, res["items"]
        doc = tensor_search.get_document_by_id(config, "s-index", "d1")
        assert doc["price"] == 4.0
        assert doc["title"] == "red apple"
        # tensors retained
        facets = tensor_search.get_document_by_id(
            config, "s-index", "d1", show_vectors=True)["_tensor_facets"]
        assert len(facets) == 2

    def test_partial_update_tensor_field_rejected(self, config):
        _add(config)
        res = config.document.partial_update_documents_by_index_name(
            "s-index", [{"_id": "d1", "title": "new title"}])
        assert res["errors"] is True
        assert res["items"][0]["status"] == 400

    def test_partial_update_missing_doc_404(self, config):
        res = config.document.partial_update_documents_by_index_name(
            "s-index", [{"_id": "nope", "price": 1.0}])
        assert res["items"][0]["status"] == 404

    def test_partial_update_unstructured_rejected(self, config):
        from marqo_tpu.core.exceptions import UnsupportedFeatureError
        config.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("u-index"))
        config.index_meta_cache.populate()
        with pytest.raises(UnsupportedFeatureError):
            config.document.partial_update_documents_by_index_name(
                "u-index", [{"_id": "a", "x": 1}])
