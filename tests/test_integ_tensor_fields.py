"""Port: tensor-fields-container behaviors through the add-documents API.

Source: /root/reference/tests/core/inference/test_tensor_fields_container.py
(30 functions). The reference tests its internal TensorFieldsContainer
class; marqo_tpu's add path plans fields differently (AddDocumentsHandler
_plan_field), so this port asserts the same BEHAVIORS through the public
API: which field/type combinations are collected or rejected (with the
container's exact error messages), custom-vector normalization, multimodal
subfield population, and the persisted chunk/embedding shapes. The
populate-from-existing-docs condition matrix is already ported in
tests/test_integ_use_existing_tensors.py (PARITY.md #31).
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "tfc-index"


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


def _add(cfg, docs, tensor_fields, mappings=None, **kw):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=tensor_fields,
        mappings=mappings, **kw))


class TestCollectBehaviors:
    """reference test_tensor_fields_container.py:43-141"""

    def test_collect_non_tensor_fields(self, config):
        # non-tensor fields of every supported type pass through unchanged
        # and produce no tensors (reference :43-63)
        doc = {"_id": "d1", "an_int": 1, "a_float": 1.0, "a_bool": True,
               "text": "abcd", "a_list": ["abcd", "efg"],
               "a_map": {"a": 1, "b": 2}}
        res = _add(config, [doc], tensor_fields=[])
        assert res["errors"] is False, res["items"]
        got = tensor_search.get_document_by_id(config, INDEX, "d1",
                                               show_vectors=True)
        for k, v in doc.items():
            assert got[k] == v
        assert got["_tensor_facets"] == []

    def test_collect_tensor_field_with_non_string_type(self, config):
        # reference :90-110 — the container's exact message
        for bad in [1, 1.0, True, ["abcd", "efg"], {"a": 1, "b": 2}]:
            res = _add(config, [{"_id": "d1", "tensor_field1": bad}],
                       tensor_fields=["tensor_field1"])
            assert res["errors"] is True, bad
            assert (f"Invalid type {type(bad)} for tensor field "
                    f"tensor_field1") in res["items"][0]["error"]

    def test_collect_tensor_field_with_string_type(self, config):
        res = _add(config, [{"_id": "d1", "tensor_field1": "content"}],
                   tensor_fields=["tensor_field1"])
        assert res["errors"] is False
        got = tensor_search.get_document_by_id(config, INDEX, "d1",
                                               show_vectors=True)
        assert got["tensor_field1"] == "content"
        assert len(got["_tensor_facets"]) == 1
        assert got["_tensor_facets"][0]["tensor_field1"] == "content"

    def test_collect_multimodal_field_should_raise_error(self, config):
        # a multimodal combo field cannot be assigned a direct value;
        # the semi-structured path surfaces the conflicting-fields message
        # (unstructured_validation.py:105-111 runs before the container)
        res = _add(config, [{"_id": "d1", "combo_field1": "abc"}],
                   tensor_fields=["combo_field1"],
                   mappings={"combo_field1": {
                       "type": "multimodal_combination",
                       "weights": {"subfield1": 1.0}}})
        assert res["errors"] is True
        assert ("conflicting fields" in res["items"][0]["error"]
                or "cannot be assigned a value"
                in res["items"][0]["error"])

    def test_multimodal_subfield_must_be_string(self, config):
        # reference unstructured_validation.py:95-103 exact message
        res = _add(config, [{"_id": "d1", "subfield1": 2.4,
                             "other": "text"}],
                   tensor_fields=["combo_field1"],
                   mappings={"combo_field1": {
                       "type": "multimodal_combination",
                       "weights": {"subfield1": 1.0, "other": 0.5}}})
        assert res["errors"] is True
        assert ("Multimodal subfields must be strings representing text "
                "or image pointer, received subfield1:2.4, which is of "
                "type float") in res["items"][0]["error"]


class TestCustomVectorCollect:
    """reference test_tensor_fields_container.py:65-81"""

    CV_INDEX = "tfc-cv-index"

    @pytest.fixture
    def cv_config(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="custom-2d",
                          modelProperties={"type": "random",
                                           "dimensions": 2})
            .to_marqo_index(self.CV_INDEX))
        cfg.index_meta_cache.populate()
        yield cfg
        inference.clear_loaded_models()

    def test_collect_custom_vector_field(self, cv_config):
        # content becomes the stored chunk; the vector is normalised:
        # [1, 2] → [0.4472, 0.8944] (reference :65-81)
        res = tensor_search.add_documents(cv_config, AddDocsParams(
            index_name=self.CV_INDEX,
            docs=[{"_id": "d1", "custom_vector_field1": {
                "content": "content1", "vector": [1.0, 2.0]}}],
            tensor_fields=["custom_vector_field1"],
            mappings={"custom_vector_field1": {"type": "custom_vector"}}))
        assert res["errors"] is False, res["items"]
        got = tensor_search.get_document_by_id(
            cv_config, self.CV_INDEX, "d1", show_vectors=True)
        assert got["custom_vector_field1"] == "content1"
        facet = got["_tensor_facets"][0]
        assert facet["custom_vector_field1"] == "content1"
        assert np.allclose(facet["_embedding"],
                           [0.4472135954999579, 0.8944271909999159])


class TestMultimodalSubfieldPopulation:
    """reference test_tensor_fields_container.py:158-197"""

    def test_combo_uses_only_present_subfields(self, config):
        # combo_field2 weights subfield1 + tensor_field2; doc has both →
        # combo built from both; another doc has only tensor_field2 →
        # combo built from it alone; a doc with neither gets NO combo
        mappings = {"combo_field2": {
            "type": "multimodal_combination",
            "weights": {"subfield1": 2.0, "tensor_field2": 5.0}}}
        res = _add(config, [
            {"_id": "both", "subfield1": "subfield1_content",
             "tensor_field2": "tensor_field2_content"},
            {"_id": "one", "tensor_field2": "tensor_field2_content"},
            {"_id": "none", "unrelated": "text"},
        ], tensor_fields=["combo_field2"], mappings=mappings)
        assert res["errors"] is False, res["items"]

        both = tensor_search.get_document_by_id(config, INDEX, "both",
                                                show_vectors=True)
        one = tensor_search.get_document_by_id(config, INDEX, "one",
                                               show_vectors=True)
        none = tensor_search.get_document_by_id(config, INDEX, "none",
                                                show_vectors=True)
        assert len(both["_tensor_facets"]) == 1
        assert len(one["_tensor_facets"]) == 1
        assert none["_tensor_facets"] == []
        # different subfield sets → different combo embeddings
        assert not np.allclose(both["_tensor_facets"][0]["_embedding"],
                               one["_tensor_facets"][0]["_embedding"])

    def test_combo_weights_change_embedding(self, config):
        # same subfield content under different weights → different vector
        doc = {"subfield1": "some text here",
               "tensor_field2": "other text there"}
        for _id, w in [("w1", {"subfield1": 1.0, "tensor_field2": 0.1}),
                       ("w2", {"subfield1": 0.1, "tensor_field2": 1.0})]:
            res = _add(config, [dict(doc, _id=_id)],
                       tensor_fields=["combo"],
                       mappings={"combo": {"type": "multimodal_combination",
                                           "weights": w}})
            assert res["errors"] is False, res["items"]
        e1 = tensor_search.get_document_by_id(
            config, INDEX, "w1", show_vectors=True)["_tensor_facets"][0]
        e2 = tensor_search.get_document_by_id(
            config, INDEX, "w2", show_vectors=True)["_tensor_facets"][0]
        assert not np.allclose(e1["_embedding"], e2["_embedding"])
