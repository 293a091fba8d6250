"""Scenario tests mirroring the reference's integ suites
(tests/tensor_search/integ_tests/test_hybrid_search.py,
test_dict_score_modifiers.py, test_custom_vector_field.py, test_embed.py —
same behaviors, our stack)."""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

DOCS = [
    {"_id": "a1", "title": "street food market in Bangkok",
     "body": "vendors selling noodles and satay at night",
     "popularity": 5.0, "rating": {"stars": 4.5}},
    {"_id": "a2", "title": "best noodles in town",
     "body": "a quiet restaurant serving hand pulled noodles",
     "popularity": 50.0, "rating": {"stars": 3.0}},
    {"_id": "a3", "title": "mountain hiking trails",
     "body": "alpine routes with scenic views", "popularity": 2.0},
]


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index("scen-index"))
    cfg.index_meta_cache.populate()
    tensor_search.add_documents(cfg, AddDocsParams(
        index_name="scen-index", docs=DOCS,
        tensor_fields=["title", "body"]))
    yield cfg
    inference.clear_loaded_models()


class TestHybridScenarios:
    @pytest.mark.parametrize("retrieval,ranking", [
        ("disjunction", "rrf"), ("lexical", "tensor"), ("tensor", "lexical"),
        ("lexical", "lexical"), ("tensor", "tensor"),
    ])
    def test_all_method_combos(self, config, retrieval, ranking):
        res = tensor_search.search(
            config, "scen-index", text="noodles",
            search_method="HYBRID",
            hybrid_parameters={"retrievalMethod": retrieval,
                               "rankingMethod": ranking})
        assert isinstance(res["hits"], list)

    def test_invalid_combo_rejected(self, config):
        with pytest.raises(Exception):
            tensor_search.search(
                config, "scen-index", text="noodles",
                search_method="HYBRID",
                hybrid_parameters={"retrievalMethod": "disjunction",
                                   "rankingMethod": "lexical"})

    def test_per_leg_score_modifiers(self, config):
        res = tensor_search.search(
            config, "scen-index", text="noodles", search_method="HYBRID",
            hybrid_parameters={
                "retrievalMethod": "disjunction", "rankingMethod": "rrf",
                "scoreModifiersLexical": {
                    "multiply_score_by": [{"field_name": "popularity",
                                           "weight": 1.0}]},
            })
        assert len(res["hits"]) > 0

    def test_per_leg_searchable_attributes(self, config):
        res = tensor_search.search(
            config, "scen-index", text="noodles", search_method="HYBRID",
            hybrid_parameters={
                "retrievalMethod": "disjunction", "rankingMethod": "rrf",
                "searchableAttributesLexical": ["title"],
                "searchableAttributesTensor": ["title"],
            })
        assert all("_id" in h for h in res["hits"])


class TestDictScoreModifiers:
    def test_map_subfield_modifier(self, config):
        """Score modifiers address map sub-fields with dot syntax
        (reference test_dict_score_modifiers.py)."""
        res = tensor_search.search(
            config, "scen-index", text="food",
            score_modifiers={"add_to_score": [
                {"field_name": "rating.stars", "weight": 10.0}]})
        # a1 has stars 4.5 → +45; a2 has 3.0 → +30; a3 none
        top_two = [h["_id"] for h in res["hits"][:2]]
        assert top_two == ["a1", "a2"]

    def test_multiply_and_add_combined(self, config):
        res = tensor_search.search(
            config, "scen-index", text="food",
            score_modifiers={
                "multiply_score_by": [{"field_name": "popularity",
                                       "weight": 1.0}],
                "add_to_score": [{"field_name": "rating.stars",
                                  "weight": 1.0}]})
        assert res["hits"][0]["_id"] == "a2"  # popularity 50 dominates


class TestCustomVectorSearch:
    def test_custom_vector_add_and_filter(self, config):
        dims = 16
        vec = np.zeros(dims)
        vec[3] = 1.0
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="scen-index",
            docs=[{"_id": "cv1", "category": "special",
                   "embedding_field": {"content": "my special content",
                                       "vector": vec.tolist()}}],
            tensor_fields=["embedding_field"],
            mappings={"embedding_field": {"type": "custom_vector"}}))
        assert res["errors"] is False, res["items"]
        out = tensor_search.search(
            config, "scen-index",
            context={"tensor": [{"vector": vec.tolist(), "weight": 1.0}]},
            filter="category:special")
        assert out["hits"][0]["_id"] == "cv1"
        # the content string is stored and searchable lexically
        lex = tensor_search.search(config, "scen-index",
                                   text="special content",
                                   search_method="LEXICAL")
        assert any(h["_id"] == "cv1" for h in lex["hits"])


class TestEmbedScenarios:
    def test_content_types_differ_with_prefixes(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="test", textQueryPrefix="query: ",
            textChunkPrefix="passage: ").to_marqo_index("prefix-index"))
        cfg.index_meta_cache.populate()
        q = cfg.embed.embed_content("prefix-index", "hello world", "query")
        d = cfg.embed.embed_content("prefix-index", "hello world", "document")
        n = cfg.embed.embed_content("prefix-index", "hello world", None)
        cos_qd = float(np.dot(q["embeddings"][0], d["embeddings"][0]))
        assert cos_qd < 0.9999  # prefixes change the embedding
        assert len(n["embeddings"][0]) == 16
        inference.clear_loaded_models()

    def test_weighted_dict_content(self, config):
        out = config.embed.embed_content(
            "scen-index", {"hello": 0.7, "world": 0.3}, "query")
        assert len(out["embeddings"]) == 1

    def test_invalid_content_type(self, config):
        with pytest.raises(Exception):
            config.embed.embed_content("scen-index", "x", "bogus")


class TestPrefixOverrides:
    def test_request_level_chunk_prefix(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="scen-index",
            docs=[{"_id": "p1", "title": "prefix test doc"}],
            tensor_fields=["title"], text_chunk_prefix="custom: "))
        assert res["errors"] is False

    def test_request_level_query_prefix(self, config):
        res = tensor_search.search(config, "scen-index", text="noodles",
                                   text_query_prefix="custom: ")
        assert len(res["hits"]) > 0


class TestNoModelIndex:
    """Storage-only indexes with `no_model` + custom vectors (reference
    test_no_model.py behavior)."""

    def test_custom_vectors_only(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="no_model",
            modelProperties={"type": "no_model", "dimensions": 8},
        ).to_marqo_index("nm-index"))
        cfg.index_meta_cache.populate()
        vec = [1.0, 0, 0, 0, 0, 0, 0, 0]
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="nm-index",
            docs=[{"_id": "v1", "f": {"content": "stored text",
                                      "vector": vec}}],
            tensor_fields=["f"],
            mappings={"f": {"type": "custom_vector"}}))
        assert res["errors"] is False, res["items"]
        out = tensor_search.search(
            cfg, "nm-index",
            context={"tensor": [{"vector": vec, "weight": 1.0}]})
        assert out["hits"][0]["_id"] == "v1"

    def test_text_vectorise_rejected(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="no_model",
            modelProperties={"type": "no_model", "dimensions": 8},
        ).to_marqo_index("nm2-index"))
        cfg.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="nm2-index",
            docs=[{"_id": "t1", "text": "needs vectorising"}],
            tensor_fields=["text"]))
        assert res["errors"] is True  # no_model cannot vectorise
        with pytest.raises(Exception):
            tensor_search.search(cfg, "nm2-index", text="query text")


class TestRecommendHostileIds:
    def test_comma_doc_ids_still_excluded(self, config):
        """A doc id containing a comma must not split the exclusion
        filter's IN list (found by review: the id would stay IN the
        recommendations)."""
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.tensor_search import tensor_search
        docs = [{"_id": "a,b", "text": "apples and oranges"},
                {"_id": "plain", "text": "apples and pears"},
                {"_id": "other", "text": "apples and plums"}]
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="scen-index", docs=docs, tensor_fields=["text"]))
        assert res["errors"] is False
        out = config.recommender.recommend("scen-index", ["a,b"], limit=5)
        ids = [h["_id"] for h in out["hits"]]
        assert "a,b" not in ids        # input doc excluded
        assert "plain" in ids or "other" in ids


class TestWildcardLexical:
    """Reference test_wildcard_lexical_query (test_search_combined.py:778):
    a lone `*` optional term matches ALL documents (filters still apply);
    quoted "*" is literal; a required phrase still gates the wildcard."""

    @pytest.mark.parametrize("query,expected", [
        ("*", 3),            # match-all
        ('"*"', 0),          # quoted: literal, matches nothing
        ('"noodles" *', 0),  # required phrase gates; "noodles" is a term
                             # inside fields but as an exact PHRASE of one
                             # word it must match a token — see below
    ])
    def test_wildcard_variants(self, config, query, expected):
        if query == '"noodles" *':
            # phrase "noodles" DOES occur in both noodle docs; expected 2
            expected = 2
        res = tensor_search.search(config, index_name="scen-index",
                                   text=query, search_method="LEXICAL",
                                   limit=10)
        assert len(res["hits"]) == expected, (query, res["hits"])

    def test_wildcard_with_filter(self, config):
        res = tensor_search.search(config, index_name="scen-index",
                                   text="*", search_method="LEXICAL",
                                   limit=10, filter="popularity:[10 TO *]")
        assert [h["_id"] for h in res["hits"]] == ["a2"]

    def test_empty_query_returns_nothing(self, config):
        res = tensor_search.search(config, index_name="scen-index",
                                   text="", search_method="LEXICAL",
                                   limit=10)
        assert res["hits"] == []

    def test_wildcard_in_hybrid_lexical_leg(self, config):
        res = tensor_search.search(
            config, index_name="scen-index", text="*",
            search_method="HYBRID",
            hybrid_parameters={"retrievalMethod": "lexical",
                               "rankingMethod": "lexical"}, limit=10)
        assert len(res["hits"]) == 3


class TestHybridNoneQuery:
    """Reference hybrid_search.py:132-142: text=None is only valid as a
    context-vector tensor search (retrieval AND ranking both 'tensor')."""

    def test_none_query_with_context_tensor_tensor_passes(self, config):
        ctx = {"tensor": [{"vector": [0.1] * 16, "weight": 1.0}]}
        res = tensor_search.search(
            config, index_name="scen-index", text=None, context=ctx,
            search_method="HYBRID",
            hybrid_parameters={"retrievalMethod": "tensor",
                               "rankingMethod": "tensor"})
        assert len(res["hits"]) == 3

    @pytest.mark.parametrize("retrieval,ranking", [
        ("disjunction", "rrf"), ("tensor", "lexical"),
        ("lexical", "tensor"), ("lexical", "lexical")])
    def test_none_query_wrong_methods_fail(self, config, retrieval, ranking):
        from marqo_tpu.core.exceptions import InvalidArgumentError
        ctx = {"tensor": [{"vector": [0.1] * 16, "weight": 1.0}]}
        with pytest.raises(InvalidArgumentError,
                           match="both 'tensor'"):
            tensor_search.search(
                config, index_name="scen-index", text=None, context=ctx,
                search_method="HYBRID",
                hybrid_parameters={"retrievalMethod": retrieval,
                                   "rankingMethod": ranking})

    def test_none_query_without_context_fails(self, config):
        from marqo_tpu.core.exceptions import InvalidArgumentError
        with pytest.raises(InvalidArgumentError, match="context"):
            tensor_search.search(
                config, index_name="scen-index", text=None,
                search_method="HYBRID",
                hybrid_parameters={"retrievalMethod": "tensor",
                                   "rankingMethod": "tensor"})


class TestGetDocumentValidation:
    """Reference test_get_document.py:80-96 + InvalidIdsResponse: bad ids
    are 400s — per-item in batch gets, raised for single gets."""

    def test_single_get_bad_ids_raise(self, config):
        from marqo_tpu.api import exceptions as api_exceptions
        for bad in ["", 12.2, 1, [], {}, None]:
            with pytest.raises(api_exceptions.InvalidDocumentIdError):
                tensor_search.get_document_by_id(config, "scen-index", bad)

    def test_batch_get_invalid_ids_per_item(self, config):
        res = tensor_search.get_documents_by_ids(
            config, "scen-index", ["a1", 2, "missing", None])
        items = res["results"]
        assert items[0]["_found"] is True
        assert items[1]["status"] == 400
        assert "must be a string" in items[1]["message"]
        assert items[2]["_found"] is False
        assert items[3]["status"] == 400


class TestEmptySearchableAttributes:
    """Reference test_pagination_empty_searchable_attributes: [] means
    search ZERO fields (no hits); only None/absent means all fields."""

    @pytest.mark.parametrize("method", ["TENSOR", "LEXICAL"])
    def test_empty_list_returns_nothing(self, config, method):
        res = tensor_search.search(config, index_name="scen-index",
                                   text="noodles", search_method=method,
                                   searchable_attributes=[])
        assert res["hits"] == []

    def test_none_searches_all_fields(self, config):
        res = tensor_search.search(config, index_name="scen-index",
                                   text="noodles")
        assert len(res["hits"]) > 0
