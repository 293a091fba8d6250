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


class TestRecommenderDefaults:
    """Round-4 additions: default interpolation-method selection + the
    unstructured invalid-tensor-fields case (reference
    test_recommender.py:445-482, :unstructuredInvalidTensorFields)."""

    def test_default_interpolation_normalized_is_slerp(self, config,
                                                       monkeypatch):
        """Reference test_defaultInterpolationMethodNormalized_success."""
        import marqo_tpu.core.search.recommender as rec_mod
        from marqo_tpu.core.utils.vector_interpolation import \
            from_interpolation_method
        picked = []

        def spy(method):
            picked.append(method)
            return from_interpolation_method(method)

        monkeypatch.setattr(rec_mod, "from_interpolation_method", spy)
        config.recommender.recommend(INDEX, ["1", "2"])
        assert [str(m).lower() for m in picked] and \
            "slerp" in str(picked[0]).lower()

    def test_default_interpolation_non_normalized_is_lerp(self, monkeypatch):
        """Reference test_defaultInterpolationMethodNonNormalized_success."""
        import marqo_tpu.core.search.recommender as rec_mod
        from marqo_tpu.core.utils.vector_interpolation import \
            from_interpolation_method
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test", normalizeEmbeddings=False
                          ).to_marqo_index("rec-nonnorm"))
        cfg.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="rec-nonnorm", docs=DOCS, tensor_fields=["title"]))
        assert res["errors"] is False
        picked = []

        def spy(method):
            picked.append(method)
            return from_interpolation_method(method)

        monkeypatch.setattr(rec_mod, "from_interpolation_method", spy)
        cfg.recommender.recommend("rec-nonnorm", ["1", "2"])
        assert picked and "lerp" in str(picked[0]).lower() and \
            "slerp" not in str(picked[0]).lower()
        inference.clear_loaded_models()

    def test_unstructured_invalid_tensor_fields_fail(self, config):
        """Reference test_recommend_unstructuredInvalidTensorFields_failure:
        naming tensor fields that hold no vectors for the given docs is an
        InvalidArgumentError."""
        with pytest.raises((InvalidArgumentError,
                            api_exceptions.InvalidArgError)):
            config.recommender.recommend(
                INDEX, ["1", "2"], tensor_fields=["not_a_real_field"])


class TestRecommenderWeighting:
    def test_invalid_interpolation_method_is_400(self, config):
        with pytest.raises(InvalidArgumentError, match="bogus"):
            config.recommender.recommend(
                INDEX, ["1"], interpolation_method="bogus")

    def test_chunk_vectors_carry_full_doc_weight(self, config, monkeypatch):
        """Reference recommender.py:141-142: every chunk vector of a doc
        gets the doc's FULL weight ([weight] * len(vector_list)) — no
        per-chunk division, so many-chunk docs pull harder."""
        captured = {}
        from marqo_tpu.core.utils import vector_interpolation as vi
        real = vi.Lerp.interpolate

        def spy(self, vectors, weights=None):
            captured["weights"] = list(weights)
            return real(self, vectors, weights)

        monkeypatch.setattr(vi.Lerp, "interpolate", spy)
        # force multi-chunk: feed a doc with two chunks directly
        index = config.index_meta_cache.get_index(INDEX)
        tensors = config.engine.get_tensors(index.schema_name, "1")
        field, entries = next(iter(tensors.items()))
        emb = entries[0]["embedding"]
        config.engine.feed(index.schema_name, "multi", {"title": "two chunks"},
                           {field: {"chunks": ["a", "b"],
                                    "embeddings": [emb, emb]}})
        config.recommender.recommend(
            INDEX, {"multi": 0.5, "1": 1.0}, interpolation_method="lerp",
            exclude_input_documents=False)
        assert sorted(captured["weights"]) == [0.5, 0.5, 1.0]
