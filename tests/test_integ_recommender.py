"""Ported reference tests: recommender.

Source: /root/reference/tests/core/search/test_recommender.py — zero-
weight docs removed (still excluded from results), all-zero-weight and
missing-doc and no-embedding errors with reference messages, structured
tensor-field validation, include/exclude input documents, filters,
interpolation-method defaults.
"""

import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "rec-index"

DOCS = [
    {"_id": "1", "title": "Anacamptis laxiflora"},
    {"_id": "2", "title": "Cephalanthera longifolia"},
    {"_id": "3", "title": "Dactylorhiza incarnata"},
    {"_id": "6", "title": "Anacamptis morio orchid species"},
    {"_id": "7", "title": "a completely different topic entirely: cars"},
]


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(INDEX))
    cfg.index_meta_cache.populate()
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=DOCS, tensor_fields=["title"]))
    assert res["errors"] is False
    yield cfg
    inference.clear_loaded_models()


class TestRecommender:
    @pytest.mark.parametrize("method", ["slerp", "nlerp", "lerp"])
    def test_interpolation_methods_succeed(self, config, method):
        res = config.recommender.recommend(
            INDEX, ["1", "2"], interpolation_method=method,
            exclude_input_documents=False)
        assert len(res["hits"]) > 0

    def test_exclude_input_documents(self, config):
        res = config.recommender.recommend(INDEX, ["1", "2"], limit=10)
        ids = {h["_id"] for h in res["hits"]}
        assert "1" not in ids and "2" not in ids

    def test_include_input_documents(self, config):
        res = config.recommender.recommend(
            INDEX, ["1", "2"], exclude_input_documents=False, limit=10)
        ids = {h["_id"] for h in res["hits"]}
        assert {"1", "2"} <= ids

    def test_zero_weight_docs_ignored_but_excluded(self, config):
        """Zero-weight docs don't contribute vectors (SLERP would fail on
        zero-sum pairs) but stay excluded from results."""
        res = config.recommender.recommend(
            INDEX, {"1": 0, "2": 0, "3": 1},
            interpolation_method="slerp")
        ids = {h["_id"] for h in res["hits"]}
        assert not ({"1", "2", "3"} & ids)

    def test_all_zero_weight_fails(self, config):
        with pytest.raises(InvalidArgumentError) as e:
            config.recommender.recommend(INDEX, {"1": 0, "2": 0, "3": 0})
        assert "No documents with non-zero weight provided" in str(e.value)

    def test_missing_documents_fail(self, config):
        with pytest.raises(api_exceptions.InvalidArgError) as e:
            config.recommender.recommend(INDEX, ["100", "2"])
        assert "The following document IDs were not found: 100" in \
            str(e.value)

    def test_empty_documents_fail(self, config):
        for bad in (None, []):
            with pytest.raises(InvalidArgumentError):
                config.recommender.recommend(INDEX, bad)

    def test_docs_without_vectors_fail(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "nv", "plain": "no tensors here"}],
            tensor_fields=[]))
        assert res["errors"] is False
        with pytest.raises(api_exceptions.InvalidArgError) as e:
            config.recommender.recommend(INDEX, ["nv", "2"])
        assert "do not have embeddings: nv" in str(e.value)

    def test_structured_invalid_tensor_fields_fail(self, config):
        from marqo_tpu.api.models.index_settings import FieldRequest
        from marqo_tpu.core.models.marqo_index import (FieldType, IndexType)
        config.index_management.create_index(IndexSettings(
            type=IndexType.Structured, model="test",
            allFields=[FieldRequest(name="title", type=FieldType.Text)],
            tensorFields=["title"]).to_marqo_index("rec-structured"))
        config.index_meta_cache.populate()
        tensor_search.add_documents(config, AddDocsParams(
            index_name="rec-structured",
            docs=[{"_id": "1", "title": "something"}]))
        with pytest.raises(api_exceptions.InvalidFieldNameError) as e:
            config.recommender.recommend(
                "rec-structured", ["1"],
                tensor_fields=["title", "invalid_field"])
        assert 'Tensor field "invalid_field" not found' in str(e.value)

    def test_filter_combines_with_exclusion(self, config):
        res = config.recommender.recommend(
            INDEX, ["1"], filter="title:(a completely different topic "
                                 "entirely: cars)".replace(": c", "\\: c"),
            limit=10)
        # only doc 7 passes the filter; input doc 1 stays excluded
        ids = {h["_id"] for h in res["hits"]}
        assert ids <= {"7"}
