"""Port of the reference's legacy tensor_search search suite (behavioral
subset).

Source: /root/reference/tests/tensor_search/test_search.py — NOTE: the
reference marks the whole class `@unittest.skip` (it predates the Vespa
migration), but its assertions encode API behaviors that are still live in
v2.13 (searchable-attribute caps, result-count limits, weighted
multi-queries, filter matrices, attributes_to_retrieve edge cases). This
port keeps the behaviors that are still part of the current API and drops
OpenSearch-era internals (verbose query bodies, match_none dummy queries —
`check_is_zero_vector` has no call sites in the v2.13 reference source).

Ordering-sensitive multi-search tests (dogs vs poodles) need real model
weights (no hub egress here); their batching logic is covered instead by
test_multi_search_check_vector, which verifies the combined query vector
equals the manually weighted np.mean — the same check the reference runs
(test_search.py:1067-1150), model-independent.
"""

import os

import numpy as np
import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "slegacy-index"


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


def _add(cfg, docs, tensor_fields):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=tensor_fields))
    assert res["errors"] is False, res


class TestSearchableAttributesCap:
    """reference test_search.py:84-131 + 928-954"""

    DOCS = [
        {"abc": "Exact match hehehe", "other_field": "baaadd", "_id": "5678"},
        {"abc": "random text", "other_field": "Close match hehehe",
         "_id": "1234"},
    ]

    def test_search_with_excessive_searchable_attributes(self, config,
                                                         monkeypatch):
        monkeypatch.setenv("MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES", "2")
        _add(config, self.DOCS, ["abc", "other_field"])
        with pytest.raises(api_exceptions.InvalidArgError):
            tensor_search.search(
                config, INDEX, text="Exact match hehehe",
                searchable_attributes=["abc", "def", "other_field"])

    def test_search_with_allowable_num_searchable_attributes(self, config,
                                                             monkeypatch):
        monkeypatch.setenv("MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES", "2")
        _add(config, self.DOCS, ["abc", "other_field"])
        tensor_search.search(config, INDEX, text="Exact match hehehe",
                             searchable_attributes=["other_field"])

    def test_search_with_searchable_attributes_max_attributes_is_none(
            self, config, monkeypatch):
        monkeypatch.delenv("MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES",
                           raising=False)
        _add(config, self.DOCS, ["abc", "other_field"])
        tensor_search.search(config, INDEX, text="Exact match hehehe",
                             searchable_attributes=["other_field"])

    def test_no_searchable_attributes_but_max_env_set(self, config,
                                                      monkeypatch):
        # reference: once the env cap is set, TENSOR search must pass
        # explicit searchable_attributes — None is a 400
        monkeypatch.setenv("MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES",
                           str(2 ** 31))
        _add(config, self.DOCS, ["abc", "other_field"])
        with pytest.raises(api_exceptions.InvalidArgError):
            tensor_search.search(config, INDEX, text="Exact match hehehe")

    def test_cap_does_not_apply_to_lexical(self, config, monkeypatch):
        # validate_searchable_attributes returns early for non-TENSOR
        monkeypatch.setenv("MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES", "1")
        _add(config, self.DOCS, ["abc", "other_field"])
        tensor_search.search(
            config, INDEX, text="match", search_method="LEXICAL",
            searchable_attributes=["abc", "other_field"])

    def test_empty_searchable_attributes(self, config):
        # reference test_search.py:928-954: [] means search zero fields
        _add(config, self.DOCS, ["abc", "other_field"])
        res = tensor_search.search(config, INDEX, text="some text",
                                   searchable_attributes=[],
                                   search_method="TENSOR")
        assert res["hits"] == []


class TestResultCountValidation:
    """reference test_search.py:258-298"""

    def test_result_count_validation(self, config):
        _add(config, [
            {"abc": "Exact match hehehe", "other_field": "baaadd",
             "cool_field_1": "res res res", "_id": "5678"},
            {"abc": "random text", "other_field": "Close match hehehe",
             "_id": "1234"},
            {"cool_field_1": "somewhat match", "_id": "9000"},
        ], ["abc", "other_field", "cool_field_1"])
        for bad_count in (-1, 0, 1000000):
            with pytest.raises(api_exceptions.IllegalRequestedDocCount):
                tensor_search.search(
                    config, INDEX, text="Exact match hehehe",
                    searchable_attributes=["other_field", "cool_field_1"],
                    limit=bad_count)
        res = tensor_search.search(
            config, INDEX, text="Exact match hehehe",
            searchable_attributes=["other_field", "cool_field_1"], limit=1)
        assert len(res["hits"]) >= 1

    def test_attributes_to_retrieve_non_list(self, config):
        # reference test_search.py:840-853
        _add(config, [{"cool_field_111": "this is some content"}],
             ["cool_field_111"])
        for method in ("TENSOR", "LEXICAL"):
            for bad_attr in ["jknjhc", "", dict(), 1234, 1.245]:
                with pytest.raises((api_exceptions.InvalidArgError,
                                    api_exceptions.InvalidFieldNameError)):
                    tensor_search.search(
                        config, INDEX, text="a",
                        attributes_to_retrieve=bad_attr,
                        search_method=method)


class TestListFieldFiltering:
    """reference test_search.py:368-439 — list fields filter as keywords
    on the tensor path (exact member match, including spaces) and the same
    exact-member semantics hold lexically."""

    DOCS = [
        {"abc": "some text", "other_field": "baaadd", "_id": "5678",
         "my_string": "b"},
        {"abc": "some text", "other_field": "Close match hehehe",
         "_id": "1234", "an_int": 2},
        {"abc": "some text", "_id": "1235",
         "my_list": ["tag1", "tag2 some"]},
    ]

    def test_filtering_list_case_tensor(self, config):
        _add(config, self.DOCS, ["abc", "other_field"])

        res_exists = tensor_search.search(
            config, INDEX, text="", filter="my_list:tag1")
        res_not_exists = tensor_search.search(
            config, INDEX, text="", filter="my_list:tag55")
        res_other = tensor_search.search(
            config, INDEX, text="", filter="my_string:b")
        # list members are keywords: "tag2" alone must NOT match the
        # member "tag2 some"; the exact phrase (incl. space) must
        res_keyword_bad = tensor_search.search(
            config, INDEX, text="", filter="my_list:tag2")
        res_keyword_good = tensor_search.search(
            config, INDEX, text="", filter="my_list:(tag2 some)")

        assert res_exists["hits"][0]["_id"] == "1235"
        assert len(res_exists["hits"]) == 1
        assert len(res_not_exists["hits"]) == 0
        assert res_other["hits"][0]["_id"] == "5678"
        assert len(res_other["hits"]) == 1
        assert len(res_keyword_bad["hits"]) == 0
        assert len(res_keyword_good["hits"]) == 1

    def test_filtering_list_case_lexical(self, config):
        _add(config, self.DOCS, ["abc", "other_field"])
        base = dict(search_method="LEXICAL", text="some")
        res_exists = tensor_search.search(
            config, INDEX, filter="my_list:tag1", **base)
        res_not_exists = tensor_search.search(
            config, INDEX, filter="my_list:tag55", **base)
        res_other = tensor_search.search(
            config, INDEX, filter="my_string:b", **base)

        assert res_exists["hits"][0]["_id"] == "1235"
        assert len(res_exists["hits"]) == 1
        assert len(res_not_exists["hits"]) == 0
        assert res_other["hits"][0]["_id"] == "5678"
        assert len(res_other["hits"]) == 1


class TestLexicalFiltering:
    """reference test_search.py:668-712"""

    def test_lexical_filtering(self, config):
        _add(config, [
            {
                "doc_title": "The captain bravely lead her followers into "
                             "battle. She directed her soldiers to and fro.",
                "field_x": "some text",
                "field1": "other things", "my_bool": True,
                "_id": "123456", "a_float": 0.61,
            },
            {
                "_id": "other_doc", "a_float": 0.66, "bfield":
                "some text too", "my_int": 5,
                "fake_int": "234", "fake_float": "1.23",
                "gapped_field_name": "gap",
            },
        ], ["doc_title", "field_x", "field1", "bfield"])

        res = tensor_search.search(
            config, INDEX, text="some text", limit=3,
            filter="(my_bool:true AND a_float:[0.1 TO 0.75]) "
                   "AND field1:(other things)",
            search_method="LEXICAL")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "123456"

        # the legacy suite also asserted OpenSearch's `*:*` match-all
        # filter; that syntax has no occurrence in the v2.13 reference
        # source or its live suites, so it is not ported
        INF = float("inf")
        pairs = [
            ("my_looLoo:1", None),
            ("my_int:5", "other_doc"), ("my_int:[1 TO 10]", "other_doc"),
            ("a_float:0.61", "123456"), ("field1:(other things)", "123456"),
            # string-typed numerics exact-match as strings
            ("fake_int:234", "other_doc"), ("fake_float:1.23", "other_doc"),
            ("gapped_field_name:gap", "other_doc"),
        ]
        for filter_str, expected in pairs:
            check = tensor_search.search(
                config, INDEX, text="some text", limit=3,
                filter=filter_str, search_method="LEXICAL")
            if expected is None:
                assert len(check["hits"]) == 0, filter_str
            elif expected == INF:
                assert len(check["hits"]) == 2, filter_str
            else:
                assert len(check["hits"]) == 1, filter_str
                assert expected == check["hits"][0]["_id"], filter_str


class TestMultiSearch:
    """reference test_search.py:988-1236 (model-independent subset)"""

    DOCS = [
        {"field_a": "Doberman, canines, golden retrievers are humanity's "
                    "best friends", "_id": "dog_doc"},
        {"field_a": "All things poodles! Poodles are great pets",
         "_id": "poodle_doc"},
        {"field_a": "Construction and scaffolding equipment",
         "_id": "irrelevant_doc"},
    ]

    def test_multi_search_returns_all(self, config):
        _add(config, self.DOCS, ["field_a"])
        for query in [{"Dogs": 2.0, "Poodles": -2}, "dogs", {"dogs": 1},
                      {"Dogs": -2.0, "Poodles": 2}]:
            res = tensor_search.search(config, INDEX, text=query, limit=5,
                                       search_method="TENSOR")
            assert len(res["hits"]) == 3

    def test_multi_search_check_vector(self, config):
        """The combined query vector must equal the manually weighted
        np.mean of the part vectors, normalized (reference
        test_search.py:1067-1150, production merge tensor_search.py:1967).
        """
        _add(config, self.DOCS, ["field_a"])
        index = config.index_meta_cache.get_index(INDEX)
        multi_queries = [
            {"artefact": 5.0, "photo realistic": -1},
            {"random query": 3, "another piece of text": -1.0},
            {"hello": 3, "some thing": -1.0},
        ]
        for multi_query in multi_queries:
            prefix = index.model.get_text_query_prefix(None)
            weighted_vectors = []
            for q, weight in multi_query.items():
                vec = inference.vectorise(
                    model_name=index.model.name, content=[prefix + q],
                    normalize_embeddings=index.normalize_embeddings,
                    device="cpu")[0]
                weighted_vectors.append(np.asarray(vec) * weight)
            manually_combined = np.mean(weighted_vectors, axis=0)
            norm = np.linalg.norm(manually_combined, axis=-1, keepdims=True)
            if norm > 0:
                manually_combined /= norm
            combined_query = tensor_search.compute_query_vector(
                index, multi_query, None, "cpu")
            assert np.allclose(combined_query, manually_combined,
                               atol=1e-6), multi_query

    def test_multi_search_edge_cases(self, config):
        # reference test_search.py:1152-1184; the core InvalidArgumentError
        # maps to the same 400 invalid_argument envelope at the API layer
        from marqo_tpu.core.exceptions import InvalidArgumentError
        _add(config, self.DOCS, ["field_a"])
        invalid_queries = [{}, None, {123: 123}, {"123": None}, set()]
        for q in invalid_queries:
            with pytest.raises((api_exceptions.InvalidArgError,
                                api_exceptions.BadRequestError,
                                InvalidArgumentError)):
                tensor_search.search(config, INDEX, text=q, limit=5,
                                     search_method="TENSOR")

    def test_multi_search_ok_edge_cases(self, config):
        # reference test_search.py:1186-1213: whitespace-y keys and
        # zero/negative weights are fine
        _add(config, self.DOCS, ["field_a"])
        for q in [{"v ": 1.2}, {"d ": 0}, {"vf": -1}]:
            tensor_search.search(config, INDEX, text=q, limit=5,
                                 search_method="TENSOR")

    def test_multi_search_lexical_rejected(self, config):
        # reference test_search.py:1215-1236
        _add(config, self.DOCS, ["field_a"])
        for bad_method in ["LEXICAL", "kjrnkjrn", ""]:
            with pytest.raises(api_exceptions.InvalidArgError):
                tensor_search.search(config, INDEX, text={"something": 1},
                                     limit=5, search_method=bad_method)


class TestQueryVectorMeanMerge:
    """The np.mean (not sum) merge is observable on normalize=False
    indexes (reference tensor_search.py:1967)."""

    def test_unnormalized_mean_merge(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test", normalizeEmbeddings=False)
            .to_marqo_index("slegacy-unnorm"))
        cfg.index_meta_cache.populate()
        index = cfg.index_meta_cache.get_index("slegacy-unnorm")
        prefix = index.model.get_text_query_prefix(None)
        parts = {"alpha": 2.0, "beta": 1.0, "gamma": -0.5}
        weighted = []
        for q, w in parts.items():
            vec = inference.vectorise(
                model_name=index.model.name, content=[prefix + q],
                normalize_embeddings=False, device="cpu")[0]
            weighted.append(np.asarray(vec) * w)
        expected = np.mean(weighted, axis=0)
        got = tensor_search.compute_query_vector(index, parts, None, "cpu")
        assert np.allclose(got, expected, atol=1e-6)
        inference.clear_loaded_models()
