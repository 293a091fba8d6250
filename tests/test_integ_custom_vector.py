"""Ported reference integ tests: custom vector fields.

Source:
/root/reference/tests/tensor_search/integ_tests/test_custom_vector_field.py
— stored-as-given vectors with content chunks, invalid-content validation,
tensor/lexical search, filters, searchable attributes, multimodal-subfield
prohibition, normalize_embeddings handling.
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

STRUCTURED = "cv-structured"
UNSTRUCTURED = "cv-unstructured"
DIMS = 16  # "test" model dimension

MAPPINGS = {"my_custom_vector": {"type": "custom_vector"}}


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="test",
        allFields=[
            FieldRequest(name="text_field", type=FieldType.Text,
                         features=[FieldFeature.LexicalSearch]),
            FieldRequest(name="my_custom_vector", type=FieldType.CustomVector,
                         features=[FieldFeature.LexicalSearch,
                                   FieldFeature.Filter]),
        ],
        tensorFields=["text_field", "my_custom_vector"],
    ).to_marqo_index(STRUCTURED))
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(UNSTRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _vec(seed):
    rng = np.random.default_rng(seed)
    v = rng.random(DIMS) + 0.01
    return (v / np.linalg.norm(v)).tolist()


V1 = _vec(1)
V2 = _vec(2)


def _add(cfg, index_name, docs):
    unstructured = index_name == UNSTRUCTURED
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=index_name, docs=docs,
        tensor_fields=["my_custom_vector", "text_field"]
        if unstructured else None,
        mappings=MAPPINGS if unstructured else None))


class TestCustomVectorAdd:
    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_add_and_get_with_content(self, config, index_name):
        res = _add(config, index_name, [{
            "_id": "0", "my_custom_vector": {
                "content": "custom content is here!!", "vector": V1}}])
        assert res["errors"] is False, res
        doc = tensor_search.get_document_by_id(config, index_name, "0",
                                               show_vectors=True)
        assert doc["my_custom_vector"] == "custom content is here!!"
        facet = doc["_tensor_facets"][0]
        assert facet["my_custom_vector"] == "custom content is here!!"
        np.testing.assert_allclose(facet["_embedding"], V1, atol=1e-6)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_add_no_content_autofills_empty(self, config, index_name):
        res = _add(config, index_name, [{
            "_id": "0", "my_custom_vector": {"vector": V1}}])
        assert res["errors"] is False, res
        doc = tensor_search.get_document_by_id(config, index_name, "0",
                                               show_vectors=True)
        assert doc["_tensor_facets"][0]["my_custom_vector"] == ""

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_invalid_custom_vector_field_content(self, config, index_name):
        cases = [
            {"content": "custom content is here!!", "vector": [1.0] * 3},
            {"content": 12345, "vector": V1},
            {"content": "custom content is here!!",
             "vector": V1[:-1] + ["NOT A FLOAT"]},
            {"content": "custom content is here!!", "vector": V1,
             "extra_field": "blah"},
            {"content": "custom content is here!!"},
            {"content": {"content": "nested!", "vector": V1}, "vector": V1},
        ]
        for case in cases:
            res = _add(config, index_name, [{"_id": "0",
                                             "my_custom_vector": case}])
            assert res["errors"] is True, case
            assert res["items"][0]["status"] == 400, case

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_zero_vector_normalize_true_fails(self, config, index_name):
        res = _add(config, index_name, [{
            "_id": "0", "my_custom_vector": {
                "content": "custom content is here!!",
                "vector": [0.0] * DIMS}}])
        assert res["errors"] is True
        item = res["items"][0]
        assert item["status"] == 400
        assert item["code"] == "invalid_argument"
        assert "zero magnitude vector, cannot normalize." in item["message"]

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_mixed_with_other_field_types(self, config, index_name):
        res = _add(config, index_name, [
            {"_id": "0", "text_field": "blah",
             "my_custom_vector": {"content": "custom!", "vector": V1}},
            {"_id": "1", "text_field": "normal doc"},
        ])
        assert res["errors"] is False, res
        assert {i["status"] for i in res["items"]} == {200}


class TestCustomVectorSearch:
    def _seed(self, cfg, index_name):
        res = _add(cfg, index_name, [
            {"_id": "custom_vector_doc", "my_custom_vector": {
                "content": "custom content is here!!", "vector": V1}},
            {"_id": "empty_content_custom_vector_doc",
             "my_custom_vector": {"vector": V2}},
            {"_id": "normal_doc", "text_field": "blah"},
        ])
        assert res["errors"] is False, res

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_tensor_search_with_context(self, config, index_name):
        self._seed(config, index_name)
        res = tensor_search.search(
            config, index_name, text={"dummy text": 0},
            search_method="TENSOR",
            context={"tensor": [{"vector": V1, "weight": 1}]})
        assert res["hits"][0]["_id"] == "custom_vector_doc"
        assert abs(res["hits"][0]["_score"] - 1.0) < 1e-5
        assert res["hits"][0]["_highlights"][0]["my_custom_vector"] == \
            "custom content is here!!"
        res = tensor_search.search(
            config, index_name, text={"dummy text": 0},
            search_method="TENSOR",
            context={"tensor": [{"vector": V2, "weight": 1}]})
        assert res["hits"][0]["_id"] == "empty_content_custom_vector_doc"
        assert res["hits"][0]["_highlights"][0]["my_custom_vector"] == ""
        res = tensor_search.search(config, index_name, text="blah",
                                   search_method="TENSOR")
        assert res["hits"][0]["_id"] == "normal_doc"

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_lexical_search_on_content(self, config, index_name):
        self._seed(config, index_name)
        res = tensor_search.search(config, index_name,
                                   text="custom content is here!!",
                                   search_method="LEXICAL")
        assert res["hits"][0]["_id"] == "custom_vector_doc"

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_filter_on_content(self, config, index_name):
        self._seed(config, index_name)
        res = tensor_search.search(
            config, index_name, text={"dummy text": 0},
            search_method="TENSOR",
            context={"tensor": [{"vector": V2, "weight": 1}]},
            filter="my_custom_vector:(custom content is here!!)")
        assert len(res["hits"]) == 1
        assert res["hits"][0]["_id"] == "custom_vector_doc"

    def test_searchable_attributes(self, config):
        # structured only (searchable attributes on unstructured removed
        # in 2.13)
        self._seed(config, STRUCTURED)
        res = tensor_search.search(
            config, STRUCTURED, text={"dummy text": 0},
            search_method="TENSOR",
            context={"tensor": [{"vector": V2, "weight": 1}]},
            searchable_attributes=["text_field"])
        assert all(h["_id"] == "normal_doc" for h in res["hits"])


class TestCustomVectorMultimodal:
    @pytest.mark.parametrize("index_name", [UNSTRUCTURED])
    def test_custom_vector_subfield_of_multimodal_fails(self, config,
                                                        index_name):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name,
            docs=[{"_id": "0",
                   "my_custom_vector": {"content": "blah", "vector": V1}}],
            tensor_fields=["my_multimodal"],
            mappings={
                "my_custom_vector": {"type": "custom_vector"},
                "my_multimodal": {
                    "type": "multimodal_combination",
                    "weights": {"my_custom_vector": 0.5, "text": 0.5}}}))
        assert res["errors"] is True
        assert res["items"][0]["status"] == 400


class TestCustomVectorResidual:
    """Round-4 additions: the reference tests not yet covered
    (test_custom_vector_field.py:
    use_existing_tensors :?, score modifiers, normalize=True roundtrip)."""

    def test_use_existing_tensors_with_custom_vector_field(self, config):
        """Reference test_add_documents_use_existing_tensors_with_custom_
        vector_field: re-adding the same custom vector with
        use_existing_tensors keeps the stored embedding; changing the
        vector replaces it."""
        doc = {"_id": "cv1", "my_custom_vector": {
            "content": "custom content", "vector": V1}}
        res = _add(config, UNSTRUCTURED, [doc])
        assert res["errors"] is False, res

        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=UNSTRUCTURED, docs=[doc],
            tensor_fields=["my_custom_vector"], mappings=MAPPINGS,
            use_existing_tensors=True))
        assert res["errors"] is False, res
        got = tensor_search.get_document_by_id(
            config, UNSTRUCTURED, "cv1", show_vectors=True)
        emb = got["_tensor_facets"][0]["_embedding"]
        np.testing.assert_allclose(emb, V1, atol=1e-6)

        doc2 = {"_id": "cv1", "my_custom_vector": {
            "content": "custom content", "vector": V2}}
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=UNSTRUCTURED, docs=[doc2],
            tensor_fields=["my_custom_vector"], mappings=MAPPINGS,
            use_existing_tensors=True))
        assert res["errors"] is False, res
        got = tensor_search.get_document_by_id(
            config, UNSTRUCTURED, "cv1", show_vectors=True)
        emb = got["_tensor_facets"][0]["_embedding"]
        np.testing.assert_allclose(emb, V2, atol=1e-6)

    def test_search_with_custom_vector_field_score_modifiers(self, config):
        """Reference test_search_with_custom_vector_field_score_modifiers:
        numeric fields modify scores on hits found via custom vectors."""
        res = _add(config, UNSTRUCTURED, [
            {"_id": "cv1",
             "my_custom_vector": {"content": "red herring", "vector": V1},
             "multiplier": 2.0},
        ])
        assert res["errors"] is False, res
        base = tensor_search.search(
            config, UNSTRUCTURED, text={"dummy": 0.0},
            context={"tensor": [{"vector": V1, "weight": 1.0}]},
        )["hits"][0]["_score"]
        modified = tensor_search.search(
            config, UNSTRUCTURED, text={"dummy": 0.0},
            context={"tensor": [{"vector": V1, "weight": 1.0}]},
            score_modifiers={"add_to_score": [
                {"field_name": "multiplier", "weight": 3.0}]},
        )["hits"][0]["_score"]
        assert abs(modified - (base + 6.0)) < 0.01

    def test_custom_vector_normalized_on_normalize_true_index(self, config):
        """Reference test_add_documents_with_custom_vector_normalize_
        embeddings_true: the STORED embedding is the normalized input."""
        raw = (np.asarray(V1) * 7.5).tolist()  # non-unit vector
        res = _add(config, UNSTRUCTURED, [
            {"_id": "cvn", "my_custom_vector": {
                "content": "to be normalized", "vector": raw}}])
        assert res["errors"] is False, res
        got = tensor_search.get_document_by_id(
            config, UNSTRUCTURED, "cvn", show_vectors=True)
        emb = np.asarray(got["_tensor_facets"][0]["_embedding"])
        expected = np.asarray(raw) / np.linalg.norm(raw)
        np.testing.assert_allclose(emb, expected, atol=1e-6)
        assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-5
