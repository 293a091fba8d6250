"""Ported reference tests: multimodal combination fields (text-only
subset — the image variants need hub weights/network).

Source: /root/reference/tests/tensor_search/test_multimodal_tensor_combination.py
— single/multiple multimodal fields, vector counts, weighted-sum
semantics (field-order invariance, zero/negative weights), per-doc bad
content errors, lexical search over subfields.
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

UNSTRUCTURED = "mm-unstructured"
STRUCTURED = "mm-structured"

MAPPINGS = {"combo_field": {
    "type": "multimodal_combination",
    "weights": {"text_field": 0.5, "title": 0.8}}}


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test",
                      normalizeEmbeddings=False).to_marqo_index(
                          UNSTRUCTURED))
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="test", normalizeEmbeddings=False,
        allFields=[
            FieldRequest(name="title", type=FieldType.Text,
                         features=[FieldFeature.LexicalSearch]),
            FieldRequest(name="text_field", type=FieldType.Text,
                         features=[FieldFeature.LexicalSearch]),
            FieldRequest(name="other", type=FieldType.Text),
            FieldRequest(name="combo_field",
                         type=FieldType.MultimodalCombination,
                         dependentFields={"text_field": 0.5,
                                          "title": 0.8}),
        ],
        tensorFields=["combo_field"],
    ).to_marqo_index(STRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _add(cfg, index_name, docs, mappings=None, tensor_fields=None):
    unstructured = index_name == UNSTRUCTURED
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=index_name, docs=docs,
        mappings=(mappings or MAPPINGS) if unstructured else None,
        tensor_fields=(tensor_fields or ["combo_field"])
        if unstructured else None))


DOC = {"_id": "1", "title": "Horse rider",
       "text_field": "A rider is riding a horse jumping over the barrier."}


class TestMultimodalCombination:
    @pytest.mark.parametrize("index_name", [UNSTRUCTURED, STRUCTURED])
    def test_one_multimodal_field(self, config, index_name):
        res = _add(config, index_name, [DOC])
        assert res["errors"] is False, res
        doc = tensor_search.get_document_by_id(config, index_name, "1",
                                               show_vectors=True)
        for key, value in DOC.items():
            assert doc[key] == value
        combo_facets = [f for f in doc["_tensor_facets"]
                        if "combo_field" in f]
        assert len(combo_facets) == 1
        assert "_embedding" in combo_facets[0]

    def test_multiple_multimodal_fields(self, config):
        mappings = {
            f"mm_{i}": {"type": "multimodal_combination", "weights": w}
            for i, w in enumerate([
                {"text_field": 0.5, "title": 0.8},
                {"text_field": 0.5, "title": -1},
                {"title": 0.5, "text_field": 0},
            ])}
        res = _add(config, UNSTRUCTURED, [DOC], mappings=mappings,
                   tensor_fields=list(mappings))
        assert res["errors"] is False, res
        doc = tensor_search.get_document_by_id(config, UNSTRUCTURED, "1",
                                               show_vectors=True)
        mm_facets = [f for f in doc["_tensor_facets"]
                     if any(k.startswith("mm_") for k in f)]
        assert len(mm_facets) == 3

    @pytest.mark.parametrize("index_name", [UNSTRUCTURED, STRUCTURED])
    def test_correct_number_of_vectors(self, config, index_name):
        """A multimodal field yields ONE vector regardless of sub-field
        count; missing sub-fields do not add vectors."""
        res = _add(config, index_name, [
            {"_id": "1", "title": "a", "text_field": "b"},
            {"_id": "2", "title": "only title"},
            {"_id": "3", "other": "no combo sub-fields at all"},
        ])
        assert res["errors"] is False, res
        stats = config.monitoring.get_index_stats(index_name)
        assert stats["numberOfDocuments"] == 3
        assert stats["numberOfVectors"] == 2  # docs 1 and 2 only

    @pytest.mark.parametrize("index_name", [UNSTRUCTURED, STRUCTURED])
    def test_combination_is_weighted_mean(self, config, index_name):
        """The multimodal vector equals np.mean([w_i * v_i]) over the
        present sub-fields — weighted mean, NOT sum (unnormalized index;
        reference tensor_fields_container.py:355-360 and the active
        test_multimodal_tensor_combination_tensor_value)."""
        res = _add(config, index_name, [DOC])
        assert res["errors"] is False
        doc = tensor_search.get_document_by_id(config, index_name, "1",
                                               show_vectors=True)
        combo = [f["_embedding"] for f in doc["_tensor_facets"]
                 if "combo_field" in f][0]
        # unnormalized index → sub-vectors are unnormalized too
        text_vec = np.asarray(inference.vectorise(
            "test", [DOC["text_field"]], device="cpu",
            normalize_embeddings=False)[0])
        title_vec = np.asarray(inference.vectorise(
            "test", [DOC["title"]], device="cpu",
            normalize_embeddings=False)[0])
        expected = (0.5 * text_vec + 0.8 * title_vec) / 2
        np.testing.assert_allclose(combo, expected, atol=1e-4)

    def test_field_order_invariance(self, config):
        """Dict field order must not change the combined vector."""
        _add(config, UNSTRUCTURED, [
            {"_id": "a", "title": "Horse rider", "text_field": "text one"},
            {"_id": "b", "text_field": "text one", "title": "Horse rider"},
        ])
        docs = tensor_search.get_documents_by_ids(
            config, UNSTRUCTURED, ["a", "b"], show_vectors=True)
        embs = []
        for d in docs["results"]:
            embs.append([f["_embedding"] for f in d["_tensor_facets"]
                         if "combo_field" in f][0])
        np.testing.assert_allclose(embs[0], embs[1], atol=1e-6)

    @pytest.mark.parametrize("index_name", [UNSTRUCTURED, STRUCTURED])
    def test_bad_sub_field_content_fails_doc(self, config, index_name):
        res = _add(config, index_name, [
            {"_id": "1", "title": "ok", "text_field": "fine"},
            {"_id": "2", "title": ["a", "list"], "text_field": "fine"},
        ])
        statuses = {i["_id"]: i["status"] for i in res["items"]}
        assert statuses["1"] == 200
        assert statuses["2"] == 400

    def test_lexical_search_on_subfields(self, config):
        """Sub-fields remain lexically searchable even though only the
        combination is a tensor field."""
        _add(config, UNSTRUCTURED, [DOC])
        res = tensor_search.search(config, UNSTRUCTURED,
                                   text="Horse rider",
                                   search_method="LEXICAL")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "1"
