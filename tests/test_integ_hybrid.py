"""Ported reference integ tests: hybrid search.

Source: /root/reference/tests/tensor_search/integ_tests/test_hybrid_search.py
— alpha boundary equivalences (0 → lexical ordering, 1 → tensor
ordering), same-method equivalence, invalid/conflicting parameter
matrices, per-leg score modifiers, filters, defaults, highlights.
Runs over structured + semi-structured indexes like the reference.
"""

import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

STRUCTURED = "hy-structured"
UNSTRUCTURED = "hy-unstructured"

DOCS = [
    {"_id": "doc1", "text_field_1": "dogs"},
    {"_id": "doc2", "text_field_1": "puppies"},
    {"_id": "doc3", "text_field_1": "canines", "add_field_1": 2.0,
     "mult_field_1": 3.0},
    {"_id": "doc4", "text_field_1": "huskies"},
    {"_id": "doc5", "text_field_1": "four-legged animals"},
    {"_id": "doc6", "text_field_1": "hot dogs"},
    {"_id": "doc7", "text_field_1": "dogs is a word"},
    {"_id": "doc8", "text_field_1": "something something dogs",
     "add_field_1": 1.0, "mult_field_1": 2.0},
    {"_id": "doc9", "text_field_1": "dogs random words"},
    {"_id": "doc10", "text_field_1": "dogs dogs dogs"},
    {"_id": "doc11", "text_field_2": "dogs but wrong field"},
    {"_id": "doc12", "text_field_2": "puppies puppies",
     "add_field_1": -1.0, "mult_field_1": 0.5},
    {"_id": "doc13", "text_field_2": "canines canines"},
]


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    feats = [FieldFeature.LexicalSearch, FieldFeature.Filter]
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="test",
        allFields=[
            FieldRequest(name="text_field_1", type=FieldType.Text,
                         features=feats),
            FieldRequest(name="text_field_2", type=FieldType.Text,
                         features=feats),
            FieldRequest(name="text_field_3", type=FieldType.Text,
                         features=feats),
            FieldRequest(name="add_field_1", type=FieldType.Float,
                         features=[FieldFeature.ScoreModifier]),
            FieldRequest(name="mult_field_1", type=FieldType.Float,
                         features=[FieldFeature.ScoreModifier]),
        ],
        tensorFields=["text_field_1", "text_field_2", "text_field_3"],
    ).to_marqo_index(STRUCTURED))
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(UNSTRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _add(cfg, index_name, docs=DOCS):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=index_name, docs=docs,
        tensor_fields=["text_field_1", "text_field_2", "text_field_3"]
        if index_name == UNSTRUCTURED else None))
    assert res["errors"] is False, res


class TestHybridAlphaBoundaries:
    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_zero_alpha_same_as_lexical(self, config, index_name):
        _add(config, index_name)
        hybrid = tensor_search.search(
            config, index_name, text="dogs", search_method="HYBRID",
            limit=10, hybrid_parameters={
                "retrievalMethod": "disjunction", "rankingMethod": "rrf",
                "alpha": 0, "verbose": True})
        lexical = tensor_search.search(config, index_name, text="dogs",
                                       search_method="LEXICAL", limit=10)
        assert len(hybrid["hits"]) == len(lexical["hits"])
        for h, l in zip(hybrid["hits"], lexical["hits"]):
            assert h["_id"] == l["_id"]
            assert abs(h["_lexical_score"] - l["_score"]) < 1e-6

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_one_alpha_same_as_tensor(self, config, index_name):
        _add(config, index_name)
        hybrid = tensor_search.search(
            config, index_name, text="dogs", search_method="HYBRID",
            limit=10, hybrid_parameters={
                "retrievalMethod": "disjunction", "rankingMethod": "rrf",
                "alpha": 1.0, "verbose": True})
        tensor = tensor_search.search(config, index_name, text="dogs",
                                      search_method="TENSOR", limit=10)
        assert len(hybrid["hits"]) == len(tensor["hits"])
        for h, t in zip(hybrid["hits"], tensor["hits"]):
            assert h["_id"] == t["_id"]
            assert abs(h["_tensor_score"] - t["_score"]) < 1e-6

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    @pytest.mark.parametrize("method", ["lexical", "tensor"])
    def test_same_retrieval_and_ranking_matches_original(self, config,
                                                         index_name,
                                                         method):
        _add(config, index_name)
        hybrid = tensor_search.search(
            config, index_name, text="dogs", search_method="HYBRID",
            limit=10, hybrid_parameters={
                "retrievalMethod": method, "rankingMethod": method})
        original = tensor_search.search(config, index_name, text="dogs",
                                        search_method=method.upper(),
                                        limit=10)
        assert len(hybrid["hits"]) == len(original["hits"])
        for h, o in zip(hybrid["hits"], original["hits"]):
            assert h["_id"] == o["_id"]
            assert abs(h["_score"] - o["_score"]) < 1e-6


class TestHybridParametersValidation:
    CASES = [
        ({"alpha": 0.6, "rankingMethod": "tensor"},
         "can only be defined for 'rrf'"),
        ({"rrfK": 61, "rankingMethod": "lexical"},
         "can only be defined for 'rrf'"),
        ({"alpha": 1.1}, "between 0 and 1"),
        ({"rrfK": -1}, "greater than or equal to 0"),
        ({"retrievalMethod": "disjunction", "rankingMethod": "lexical"},
         "rankingMethod must be: rrf"),
        ({"retrievalMethod": "tensor", "rankingMethod": "rrf"},
         "rankingMethod must be: tensor or lexical"),
        ({"retrievalMethod": "lexical", "rankingMethod": "rrf"},
         "rankingMethod must be: tensor or lexical"),
        ({"retrievalMethod": "tensor", "rankingMethod": "tensor",
          "scoreModifiersLexical": {"multiply_score_by": [
              {"field_name": "mult_field_1", "weight": 1.0}]}},
         "can only be defined for 'lexical'"),
        ({"retrievalMethod": "tensor", "rankingMethod": "lexical",
          "scoreModifiersTensor": {"multiply_score_by": [
              {"field_name": "mult_field_1", "weight": 1.0}]}},
         "can only be defined for 'tensor'"),
        ({"retrievalMethod": "something something"}, ""),
        ({"rankingMethod": "something something"}, ""),
    ]

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_invalid_parameters_fail(self, config, index_name):
        _add(config, index_name)
        for params, message in self.CASES:
            with pytest.raises(Exception) as e:
                tensor_search.search(config, index_name, text="dogs",
                                     search_method="HYBRID",
                                     hybrid_parameters=params)
            if message:
                assert message in str(e.value), params

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_conflicting_parameters_fail(self, config, index_name):
        _add(config, index_name)
        with pytest.raises(Exception) as e:
            tensor_search.search(config, index_name, text="dogs",
                                 search_method="HYBRID",
                                 searchable_attributes=["text_field_1"])
        assert "searchableAttributes" in str(e.value)
        with pytest.raises(Exception) as e:
            tensor_search.search(
                config, index_name, text="dogs", search_method="HYBRID",
                score_modifiers={"multiply_score_by": [
                    {"field_name": "mult_field_1", "weight": 1.0}]})
        assert "scoreModifiers" in str(e.value)

    def test_rrfk_must_be_integer(self):
        from marqo_tpu.core.models.hybrid_parameters import HybridParameters
        with pytest.raises(Exception):
            HybridParameters(rrfK=60.1)

    def test_default_parameters(self):
        from marqo_tpu.core.models.hybrid_parameters import (
            HybridParameters, RankingMethod, RetrievalMethod)
        p = HybridParameters()
        assert p.retrievalMethod == RetrievalMethod.Disjunction
        assert p.rankingMethod == RankingMethod.RRF
        assert p.alpha == 0.5
        assert p.rrfK == 60
        assert p.searchableAttributesLexical is None
        assert p.searchableAttributesTensor is None
        assert p.scoreModifiersLexical is None
        assert p.scoreModifiersTensor is None
        assert p.verbose is False


class TestHybridBehaviors:
    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_score_modifiers_tensor_leg(self, config, index_name):
        """Reference test_hybrid_search_score_modifiers: with
        retrieval=ranking=tensor, scoreModifiersTensor modifies the final
        score — doc3 (add_field_1=2.0, +2000) must rank first."""
        _add(config, index_name)
        res = tensor_search.search(
            config, index_name, text="dogs", search_method="HYBRID",
            limit=13, hybrid_parameters={
                "retrievalMethod": "tensor", "rankingMethod": "tensor",
                "scoreModifiersTensor": {
                    "add_to_score": [{"field_name": "add_field_1",
                                      "weight": 1000}]}})
        assert res["hits"][0]["_id"] == "doc3"
        assert res["hits"][0]["_score"] > 1999
        assert res["hits"][1]["_id"] == "doc8"  # +1000

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_score_modifiers_lexical_leg(self, config, index_name):
        """retrieval=ranking=lexical with scoreModifiersLexical: doc8
        (+1000) outranks every unboosted lexical match; doc12 (-1000)
        sinks below them."""
        _add(config, index_name)
        res = tensor_search.search(
            config, index_name, text="dogs puppies",
            search_method="HYBRID", limit=13, hybrid_parameters={
                "retrievalMethod": "lexical", "rankingMethod": "lexical",
                "scoreModifiersLexical": {
                    "add_to_score": [{"field_name": "add_field_1",
                                      "weight": 1000}]}})
        ids = [h["_id"] for h in res["hits"]]
        assert ids[0] == "doc8"
        assert ids[-1] == "doc12"

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_hybrid_with_filter(self, config, index_name):
        _add(config, index_name)
        res = tensor_search.search(
            config, index_name, text="dogs", search_method="HYBRID",
            limit=10, filter="text_field_1:(dogs is a word)",
            hybrid_parameters={"retrievalMethod": "disjunction",
                               "rankingMethod": "rrf"})
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "doc7"

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_opposite_retrieval_and_ranking(self, config, index_name):
        """lexical/tensor and tensor/lexical legs both execute and rank by
        the RANKING method's score."""
        _add(config, index_name)
        for retrieval, ranking in (("lexical", "tensor"),
                                   ("tensor", "lexical")):
            res = tensor_search.search(
                config, index_name, text="dogs", search_method="HYBRID",
                limit=10, hybrid_parameters={
                    "retrievalMethod": retrieval,
                    "rankingMethod": ranking})
            assert len(res["hits"]) > 0, (retrieval, ranking)
            scores = [h["_score"] for h in res["hits"]]
            assert scores == sorted(scores, reverse=True)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_highlights_for_lexical_tensor(self, config, index_name):
        """retrieval=lexical / ranking=tensor returns tensor highlights
        (reference test_hybrid_search_highlights_for_lexical_tensor)."""
        _add(config, index_name)
        res = tensor_search.search(
            config, index_name, text="dogs", search_method="HYBRID",
            limit=5, hybrid_parameters={
                "retrievalMethod": "lexical", "rankingMethod": "tensor"})
        for hit in res["hits"]:
            assert "_highlights" in hit
            assert len(hit["_highlights"]) > 0


class TestHybridResidual:
    """Round-4 additions (reference test_hybrid_search.py:671-1835):
    per-leg searchable attributes, legacy-unstructured rejection,
    None-query rules. The Vespa-query-internals and version-gate tests
    (:test_hybrid_search_calls_correct_vespa_query, :_with_2_10/2_9) are
    engine/migration internals with no surface here."""

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_searchable_attributes(self, config, index_name):
        """Reference :671-710 — per-leg searchable attributes restrict
        both retrieval legs: only text_field_2 docs return, doc12
        (puppies puppies) first."""
        _add(config, index_name)
        res = tensor_search.search(
            config, index_name, text="puppies", search_method="HYBRID",
            limit=10, hybrid_parameters={
                "retrievalMethod": "disjunction", "rankingMethod": "rrf",
                "alpha": 0.5,
                "searchableAttributesLexical": ["text_field_2"],
                "searchableAttributesTensor": ["text_field_2"]})
        ids = [h["_id"] for h in res["hits"]]
        assert set(ids) == {"doc11", "doc12", "doc13"}, ids
        assert ids[0] == "doc12"

    def test_legacy_unstructured_searchable_attributes_fails(self, config):
        """Reference :1772-1800 — legacy (pre-semi-structured)
        unstructured indexes reject per-leg searchable attributes with
        UnsupportedFeatureError."""
        from marqo_tpu.core.exceptions import UnsupportedFeatureError
        from marqo_tpu.core.models.marqo_index import IndexType
        legacy = "hy-legacy-unstructured"
        config.index_management.create_index(IndexSettings(
            type=IndexType.Unstructured, model="test"
        ).to_marqo_index(legacy))
        config.index_meta_cache.populate()
        for key in ("searchableAttributesLexical",
                    "searchableAttributesTensor"):
            with pytest.raises(UnsupportedFeatureError) as exc:
                tensor_search.search(
                    config, legacy, text="dogs", search_method="HYBRID",
                    hybrid_parameters={
                        "retrievalMethod": "disjunction",
                        "rankingMethod": "rrf", key: ["text_field_1"]})
            assert "does not support `searchableAttributesTensor` or " \
                   "`searchableAttributesLexical`" in str(exc.value)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_none_query_wrong_retrieval_or_ranking_fails(self, config,
                                                         index_name):
        """Reference :1691-1719."""
        from marqo_tpu.core.exceptions import InvalidArgumentError
        _add(config, index_name)
        cases = [("disjunction", "rrf"), ("tensor", "lexical"),
                 ("lexical", "tensor"), ("lexical", "lexical")]
        for retrieval, ranking in cases:
            with pytest.raises(InvalidArgumentError) as exc:
                tensor_search.search(
                    config, index_name, text=None, search_method="HYBRID",
                    hybrid_parameters={"retrievalMethod": retrieval,
                                       "rankingMethod": ranking})
            assert ("unless retrieval_method and ranking_method are both "
                    "'tensor'" in str(exc.value)), (retrieval, ranking)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_none_query_with_context_vectors_passes(self, config,
                                                    index_name):
        """Reference :1721-1770 — None query + context vectors runs a
        tensor/tensor hybrid."""
        _add(config, index_name)
        dims = 16
        res = tensor_search.search(
            config, index_name, text=None, search_method="HYBRID",
            context={"tensor": [{"vector": [0.655] * dims, "weight": 1.0}]},
            hybrid_parameters={"retrievalMethod": "tensor",
                               "rankingMethod": "tensor"})
        assert len(res["hits"]) > 0


class TestHybridCustomVectorQuery:
    """Reference test_hybrid_search.py:315-560 (structured +
    semi-structured custom-vector query): the query VECTOR drives the
    tensor leg (mean with context), the CONTENT drives the lexical leg."""

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_custom_vector_query_content_drives_lexical_leg(self, config,
                                                            index_name):
        _add(config, index_name)
        dims = 16
        # content matches doc12's distinctive lexical text
        res = tensor_search.search(
            config, index_name,
            text={"customVector": {"content": "puppies",
                                   "vector": [0.1] * dims}},
            search_method="HYBRID",
            hybrid_parameters={"retrievalMethod": "disjunction",
                               "rankingMethod": "rrf", "alpha": 0.5})
        ids = [h["_id"] for h in res["hits"]]
        assert "doc12" in ids  # lexical leg found the content match

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_custom_vector_query_no_content_tensor_tensor(self, config,
                                                          index_name):
        """No content + tensor/tensor: pure vector search, no None-query
        error (reference :404-434)."""
        _add(config, index_name)
        dims = 16
        res = tensor_search.search(
            config, index_name,
            text={"customVector": {"vector": [0.4] * dims}},
            search_method="HYBRID",
            hybrid_parameters={"retrievalMethod": "tensor",
                               "rankingMethod": "tensor"})
        assert len(res["hits"]) > 0

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_custom_vector_query_vector_means_with_context(self, config,
                                                           index_name):
        """Vector [v] + context [2v] -> query embedding 1.5v (reference
        :365-400 asserts the exact mean)."""
        import numpy as np

        from marqo_tpu.tensor_search.tensor_search import \
            compute_query_vector
        _add(config, index_name)
        dims = 16
        v = [0.5] * dims
        index = config.index_meta_cache.get_index(index_name)
        merged = compute_query_vector(
            index, None,
            {"tensor": [{"vector": v, "weight": 1.0},
                        {"vector": [x * 2 for x in v], "weight": 1.0}]},
            None, None, None, None)
        expected = np.asarray(v) * 1.5
        if index.normalize_embeddings:
            expected = expected / np.linalg.norm(expected)
        np.testing.assert_allclose(np.asarray(merged), expected, atol=1e-6)


class TestValidateQueryMatrix:
    """Reference validation.py:24-72 via tensor_search.py:1517 — the q
    type/method matrix is enforced at the search entry."""

    def test_custom_vector_rejected_for_lexical(self, config):
        _add(config, UNSTRUCTURED)
        with pytest.raises(api_exceptions.InvalidArgError,
                           match='only supported for search_method="HYBRID"'):
            tensor_search.search(
                config, UNSTRUCTURED,
                text={"customVector": {"content": "puppies",
                                       "vector": [0.1] * 16}},
                search_method="LEXICAL")

    def test_custom_vector_allowed_for_tensor(self, config):
        _add(config, UNSTRUCTURED)
        res = tensor_search.search(
            config, UNSTRUCTURED,
            text={"customVector": {"vector": [0.1] * 16}},
            search_method="TENSOR")
        assert len(res["hits"]) > 0

    @pytest.mark.parametrize("method", ["LEXICAL", "HYBRID"])
    def test_multi_query_dict_only_for_tensor(self, config, method):
        _add(config, UNSTRUCTURED)
        with pytest.raises(api_exceptions.InvalidArgError,
                           match='only supported for search_method="TENSOR"'):
            tensor_search.search(config, UNSTRUCTURED,
                                 text={"dogs": 1.0, "cats": -0.5},
                                 search_method=method)

    def test_empty_multi_query_dict_rejected(self, config):
        _add(config, UNSTRUCTURED)
        with pytest.raises(api_exceptions.InvalidArgError,
                           match="at least one query"):
            tensor_search.search(config, UNSTRUCTURED, text={},
                                 search_method="TENSOR")

    def test_multi_query_bad_value_type_rejected(self, config):
        _add(config, UNSTRUCTURED)
        with pytest.raises(api_exceptions.InvalidArgError,
                           match="<string>:<float> pairs"):
            tensor_search.search(config, UNSTRUCTURED,
                                 text={"dogs": "high"},
                                 search_method="TENSOR")

    def test_non_str_dict_none_query_rejected(self, config):
        _add(config, UNSTRUCTURED)
        with pytest.raises(api_exceptions.InvalidArgError,
                           match="must be a 'string', a 'dict', or 'None'"):
            tensor_search.search(config, UNSTRUCTURED, text=12345,
                                 search_method="TENSOR")
