"""StoreEngine tests: feed/get/delete, tensor/lexical/hybrid queries,
filters, score modifiers, facets, sharding."""

import numpy as np
import pytest

from marqo_tpu.core.exceptions import IndexExistsError, IndexNotFoundError
from marqo_tpu.core.models.score_modifier import (ScoreModifier,
                                                  ScoreModifierType)
from marqo_tpu.core.search.search_filter import MarqoFilterStringParser
from marqo_tpu.engine.descriptor import IndexDescriptor, TensorFieldDescriptor
from marqo_tpu.engine.store import StoreEngine, closeness


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return (v / np.linalg.norm(v)).tolist()


@pytest.fixture
def engine():
    eng = StoreEngine(n_shards=2)
    eng.create_index(IndexDescriptor(name="idx", model_dimensions=4))
    docs = [
        ("d1", {"title": "red apple", "desc": "a fruit that is red",
                "price": 10, "tags": ["fruit", "red"], "in_stock": True},
         {"title": {"chunks": ["red apple"], "embeddings": [_unit([1, 0, 0, 0])]}}),
        ("d2", {"title": "green pear", "desc": "a green fruit",
                "price": 20, "tags": ["fruit", "green"], "in_stock": False},
         {"title": {"chunks": ["green pear"], "embeddings": [_unit([0, 1, 0, 0])]}}),
        ("d3", {"title": "red car", "desc": "a fast vehicle painted red",
                "price": 30000, "tags": ["vehicle", "red"], "in_stock": True},
         {"title": {"chunks": ["red car", "fast vehicle"],
                    "embeddings": [_unit([1, 1, 0, 0]), _unit([0, 0, 1, 0])]}}),
    ]
    for doc_id, fields, tensors in docs:
        eng.feed("idx", doc_id, fields, tensors)
    return eng


class TestDDL:
    def test_create_duplicate_raises(self, engine):
        with pytest.raises(IndexExistsError):
            engine.create_index(IndexDescriptor(name="idx", model_dimensions=4))

    def test_delete_missing_raises(self, engine):
        with pytest.raises(IndexNotFoundError):
            engine.delete_index("nope")

    def test_delete_and_list(self, engine):
        engine.create_index(IndexDescriptor(name="other", model_dimensions=4))
        assert set(engine.list_indexes()) == {"idx", "other"}
        engine.delete_index("other")
        assert engine.list_indexes() == ["idx"]


class TestDocuments:
    def test_get(self, engine):
        doc = engine.get("idx", "d1")
        assert doc["title"] == "red apple"
        assert engine.get("idx", "missing") is None

    def test_doc_and_vector_counts(self, engine):
        assert engine.doc_count("idx") == 3
        assert engine.vector_count("idx") == 4  # d3 has 2 chunks

    def test_delete(self, engine):
        assert engine.delete("idx", "d1") is True
        assert engine.delete("idx", "d1") is False
        assert engine.doc_count("idx") == 2
        assert engine.get("idx", "d1") is None

    def test_replace_document(self, engine):
        engine.feed("idx", "d1", {"title": "yellow banana"},
                    {"title": {"chunks": ["yellow banana"],
                               "embeddings": [_unit([0, 0, 0, 1])]}})
        assert engine.doc_count("idx") == 3
        assert engine.get("idx", "d1")["title"] == "yellow banana"
        assert engine.vector_count("idx") == 4

    def test_delete_all(self, engine):
        assert engine.delete_all("idx") == 3
        assert engine.doc_count("idx") == 0

    def test_visit_all(self, engine):
        docs = dict(engine.visit_all("idx"))
        assert set(docs) == {"d1", "d2", "d3"}


class TestTensorQuery:
    def test_exact_nearest(self, engine):
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=2)
        assert res.hits[0].doc_id == "d1"
        assert res.hits[0].score > res.hits[1].score

    def test_chunk_max_aggregation(self, engine):
        # d3's second chunk is exactly the query → d3 wins
        res = engine.query_tensor("idx", _unit([0, 0, 1, 0]), limit=3)
        assert res.hits[0].doc_id == "d3"
        assert res.hits[0].highlight == {"title": "fast vehicle"}

    def test_filter(self, engine):
        f = MarqoFilterStringParser().parse("tags:vehicle")
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=10,
                                  search_filter=f)
        assert [h.doc_id for h in res.hits] == ["d3"]

    def test_range_filter(self, engine):
        f = MarqoFilterStringParser().parse("price:[15 TO 100]")
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=10,
                                  search_filter=f)
        assert [h.doc_id for h in res.hits] == ["d2"]

    def test_bool_and_id_filter(self, engine):
        f = MarqoFilterStringParser().parse("in_stock:true AND NOT _id:d1")
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=10,
                                  search_filter=f)
        assert [h.doc_id for h in res.hits] == ["d3"]

    def test_offset_pagination(self, engine):
        all_hits = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=3).hits
        page2 = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=1,
                                    offset=1).hits
        assert page2[0].doc_id == all_hits[1].doc_id

    def test_attributes_to_retrieve(self, engine):
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=1,
                                  attributes_to_retrieve=["title"])
        assert set(res.hits[0].fields) == {"title"}

    def test_expose_facets(self, engine):
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=1,
                                  expose_facets=True)
        facets = res.hits[0].fields["_tensor_facets"]
        assert facets[0]["title"] == "red apple"
        assert len(facets[0]["_embedding"]) == 4

    def test_score_modifiers(self, engine):
        mods = [ScoreModifier(field="price", weight=1.0,
                              type=ScoreModifierType.Add)]
        res = engine.query_tensor("idx", _unit([1, 0, 0, 0]), limit=3,
                                  score_modifiers=mods)
        # price dominates: d3 (30000) first
        assert res.hits[0].doc_id == "d3"
        assert res.hits[0].score > 29999


class TestLexicalQuery:
    def test_bm25_ranking(self, engine):
        res = engine.query_lexical("idx", ["red"], [], limit=10)
        ids = [h.doc_id for h in res.hits]
        assert set(ids) == {"d1", "d3"}

    def test_multi_term(self, engine):
        res = engine.query_lexical("idx", ["green fruit"], [], limit=10)
        assert res.hits[0].doc_id == "d2"

    def test_required_phrase(self, engine):
        res = engine.query_lexical("idx", ["red"], ["fast vehicle"], limit=10)
        assert [h.doc_id for h in res.hits] == ["d3"]

    def test_searchable_attributes(self, engine):
        res = engine.query_lexical("idx", ["red"], [], limit=10,
                                   searchable_fields=["title"])
        assert set(h.doc_id for h in res.hits) == {"d1", "d3"}
        res = engine.query_lexical("idx", ["vehicle"], [], limit=10,
                                   searchable_fields=["title"])
        # "vehicle" appears in d3's desc but not title... except tags — title only
        assert [h.doc_id for h in res.hits] == []

    def test_filter(self, engine):
        f = MarqoFilterStringParser().parse("price:[0 TO 15]")
        res = engine.query_lexical("idx", ["red"], [], limit=10,
                                   search_filter=f)
        assert [h.doc_id for h in res.hits] == ["d1"]


class TestHybridQuery:
    def test_rrf_fusion(self, engine):
        res = engine.query_hybrid(
            "idx", _unit([1, 0, 0, 0]), ["red"], [], limit=3)
        assert res.hits[0].doc_id == "d1"  # top of both legs
        top = res.hits[0]
        assert top.raw_tensor_score is not None
        assert top.raw_lexical_score is not None
        # rrf score bound: alpha/(1+k) + (1-alpha)/(1+k) with k=60
        assert 0 < top.score <= 1.0 / 61 + 1e-9

    def test_tensor_only_retrieval(self, engine):
        res = engine.query_hybrid(
            "idx", _unit([0, 1, 0, 0]), [], [], limit=1,
            retrieval_method="tensor", ranking_method="tensor")
        assert res.hits[0].doc_id == "d2"

    def test_lexical_only_retrieval(self, engine):
        res = engine.query_hybrid(
            "idx", [0, 0, 0, 0], ["pear"], [], limit=1,
            retrieval_method="lexical", ranking_method="lexical")
        assert res.hits[0].doc_id == "d2"

    def test_alpha_one_is_tensor_ranked(self, engine):
        res = engine.query_hybrid(
            "idx", _unit([0, 1, 0, 0]), ["red"], [], limit=3, alpha=1.0)
        assert res.hits[0].doc_id == "d2"


class TestCloseness:
    def test_prenormalized_angular(self):
        q = np.array([1, 0], dtype=np.float32)
        m = np.array([[1, 0], [0, 1]], dtype=np.float32)
        scores = closeness("prenormalized-angular", q, m)
        np.testing.assert_allclose(scores, [1.0, 0.5])

    def test_euclidean(self):
        q = np.array([0, 0], dtype=np.float32)
        m = np.array([[0, 0], [3, 4]], dtype=np.float32)
        np.testing.assert_allclose(closeness("euclidean", q, m),
                                   [1.0, 1.0 / 6.0])

    def test_dotproduct(self):
        q = np.array([2, 0], dtype=np.float32)
        m = np.array([[1, 0], [3, 0]], dtype=np.float32)
        np.testing.assert_allclose(closeness("dotproduct", q, m), [2.0, 6.0])

    def test_hamming(self):
        q = np.array([1, -1, 1], dtype=np.float32)
        m = np.array([[1, -1, 1], [-1, 1, -1]], dtype=np.float32)
        np.testing.assert_allclose(closeness("hamming", q, m), [1.0, 0.25])


class TestFilterStringMaxLength:
    def test_long_strings_not_filterable(self):
        """Unstructured parity: strings above filter_string_max_length are
        lexical-only, never filterable (reference short-string threshold)."""
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="fsml", model_dimensions=4,
                                         filter_string_max_length=10))
        eng.feed("fsml", "short", {"tag": "brief"}, {})
        eng.feed("fsml", "long", {"tag": "a very long tag value here"}, {})
        f = MarqoFilterStringParser().parse(
            "tag:(a very long tag value here)")
        res = eng.query_lexical("fsml", ["tag"], [], limit=10,
                                search_filter=f)
        assert res.hits == []  # long value filtered out of the view
        f2 = MarqoFilterStringParser().parse("tag:brief")
        allowed = eng._shards("fsml")[0].allowed_docs(f2) | \
            eng._shards("fsml")[-1].allowed_docs(f2) \
            if len(eng._shards("fsml")) > 1 else \
            eng._shards("fsml")[0].allowed_docs(f2)
        assert "short" in allowed
