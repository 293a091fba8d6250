"""Ported reference tests: score-modifier search semantics.

Source: /root/reference/tests/tensor_search/test_score_modifiers_search.py
— exact formula (score × Π multiply-fields×weight + Σ add-fields×weight),
missing fields leave scores untouched, combination with filters and
attributes_to_retrieve, invalid score-modifier shapes rejected.
"""

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "sm-index"

DOCS = [
    {"_id": "0", "my_text_field": "a rider rides a horse", "filter": "original"},
    {"_id": "1", "my_text_field": "a rider rides a horse",
     "multiply_1": 1.0, "multiply_2": 20.0, "add_1": 1.0, "add_2": 30.0},
    {"_id": "2", "my_text_field": "a rider rides a horse",
     "multiply_1": 0, "multiply_2": 20.0, "add_1": 1.0, "add_2": 3.0},
    {"_id": "3", "my_text_field": "a rider rides a horse",
     "multiply_2": 20.3, "add_1": 1.2},
    {"_id": "4", "my_text_field": "a rider rides a horse",
     "add_1": 1.0, "add_2": 3.0, "multiply_1": 1, "multiply_2": -20.0},
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
        index_name=INDEX, docs=DOCS, tensor_fields=["my_text_field"]))
    assert res["errors"] is False
    yield cfg
    inference.clear_loaded_models()


def _base_scores(cfg):
    res = tensor_search.search(cfg, INDEX, text="horse rider", limit=10)
    return {h["_id"]: h["_score"] for h in res["hits"]}


class TestScoreModifierSemantics:
    def test_missing_fields_leave_score_unchanged(self, config):
        base = _base_scores(config)
        res = tensor_search.search(
            config, INDEX, text="horse rider", limit=10,
            score_modifiers={
                "multiply_score_by": [
                    {"field_name": "nonexistent_a", "weight": 4}],
                "add_to_score": [{"field_name": "nonexistent_b",
                                  "weight": 100}]})
        for hit in res["hits"]:
            assert abs(hit["_score"] - base[hit["_id"]]) < 1e-6

    def test_exact_formula(self, config):
        base = _base_scores(config)
        res = tensor_search.search(
            config, INDEX, text="horse rider", limit=10,
            score_modifiers={
                "multiply_score_by": [
                    {"field_name": "multiply_1", "weight": 2},
                    {"field_name": "multiply_2", "weight": 1}],
                "add_to_score": [
                    {"field_name": "add_1", "weight": 3},
                    {"field_name": "add_2", "weight": 1}]})
        got = {h["_id"]: h["_score"] for h in res["hits"]}

        def expected(doc_id):
            doc = next(d for d in DOCS if d["_id"] == doc_id)
            score = base[doc_id]
            if "multiply_1" in doc:
                score *= doc["multiply_1"] * 2
            if "multiply_2" in doc:
                score *= doc["multiply_2"] * 1
            if "add_1" in doc:
                score += doc["add_1"] * 3
            if "add_2" in doc:
                score += doc["add_2"] * 1
            return score

        for doc_id in ("0", "1", "2", "3", "4"):
            assert abs(got[doc_id] - expected(doc_id)) < 1e-4, doc_id

    def test_with_filter(self, config):
        res = tensor_search.search(
            config, INDEX, text="horse rider", limit=10,
            filter="filter:original",
            score_modifiers={"add_to_score": [
                {"field_name": "add_1", "weight": 100}]})
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "0"

    def test_with_attributes_to_retrieve(self, config):
        res = tensor_search.search(
            config, INDEX, text="horse rider", limit=10,
            attributes_to_retrieve=["my_text_field"],
            score_modifiers={"add_to_score": [
                {"field_name": "add_2", "weight": 1}]})
        top = res["hits"][0]
        assert top["_id"] == "1"  # +30 dominates
        assert set(top.keys()) == {"my_text_field", "_id", "_score",
                                   "_highlights"}

    @pytest.mark.parametrize("bad", [
        {"multiply_scores_by": [{"field_name": "x"}]},   # typo key
        {"add_ssto_score": [{"field_name": "x"}]},       # typo key
        {"multiply_score_by": [{"field_names": "x"}]},   # typo field_name
        {"multiply_score_by": [{"field_name": "x",
                                "weight": "not num"}]},  # bad weight
    ])
    def test_invalid_score_modifiers_rejected(self, config, bad):
        with pytest.raises(Exception):
            tensor_search.search(config, INDEX, text="horse rider",
                                 score_modifiers=bad)
