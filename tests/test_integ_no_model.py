"""Ported reference integ tests: no_model indexes.

Source: /root/reference/tests/tensor_search/integ_tests/test_no_model.py —
`no_model` stores/searches custom vectors only; any vectorisation attempt
errors; model-properties validation blocks bad dimensions/type at index
creation (s2_inference.py:345-420 validate_model_properties).
"""

import numpy as np
import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import FieldType, IndexType
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

DIMENSION = 16
STRUCTURED = "nm-structured"
UNSTRUCTURED = "nm-unstructured"


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="no_model",
        modelProperties={"dimensions": DIMENSION, "type": "no_model"},
        allFields=[
            FieldRequest(name="text_field_1", type=FieldType.Text),
            FieldRequest(name="custom_field_1", type=FieldType.CustomVector),
        ],
        tensorFields=["text_field_1", "custom_field_1"],
    ).to_marqo_index(STRUCTURED))
    cfg.index_management.create_index(IndexSettings(
        model="no_model",
        modelProperties={"dimensions": DIMENSION, "type": "no_model"},
    ).to_marqo_index(UNSTRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


class TestNoModelValidation:
    """test_create_index_with_invalid_model_properties ports."""

    @pytest.mark.parametrize("name,props", [
        ("no_model", {"dimensions": 0, "type": "no_model"}),
        ("no_model", {"dimensions": -123, "type": "no_model"}),
        ("no_model", {"dimensions": 213.213, "type": "no_model"}),
        ("no_model", {"dimensions": "512", "type": "no_model"}),
        ("no_model", {"type": "no_model"}),
        ("my_model", {"dimensions": 512, "type": "no_model"}),
    ])
    def test_invalid_model_properties_block_creation(self, config, name,
                                                     props):
        with pytest.raises(Exception) as e:
            config.index_management.create_index(IndexSettings(
                model=name, modelProperties=props,
            ).to_marqo_index("nm-invalid"))
        msg = str(e.value)
        assert ("Invalid model properties" in msg
                or "dimensions" in msg or "no_model" in msg), msg


class TestNoModelBehavior:
    def _add(self, cfg, index_name, docs):
        unstructured = index_name == UNSTRUCTURED
        return tensor_search.add_documents(cfg, AddDocsParams(
            index_name=index_name, docs=docs,
            tensor_fields=["text_field_1", "custom_field_1"]
            if unstructured else None,
            mappings={"custom_field_1": {"type": "custom_vector"}}
            if unstructured else None))

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_no_model_in_add_documents_error(self, config, index_name):
        docs = [
            {"_id": "1", "text_field_1": "text"},
            {"_id": "2", "custom_field_1": {
                "content": "test custom field content",
                "vector": [1.0] * DIMENSION}},
        ]
        r = self._add(config, index_name, docs)
        assert r["errors"] is True
        assert "Cannot vectorise anything with 'no_model'" in \
            r["items"][0]["error"]
        assert r["items"][0]["status"] == 400
        assert r["items"][0]["code"] == "invalid_argument"
        assert r["items"][0]["_id"] == "1"
        assert r["items"][1]["_id"] == "2"
        assert r["items"][1]["status"] == 200
        stats = config.monitoring.get_index_stats(index_name)
        assert stats["numberOfDocuments"] == 1
        assert stats["numberOfVectors"] == 1

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_no_model_raise_error_if_query_in_search(self, config,
                                                     index_name):
        with pytest.raises(Exception) as e:
            tensor_search.search(config, index_name, text="test")
        assert "Cannot vectorise anything with 'no_model'" in str(e.value)

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_no_model_work_with_context_vectors_in_search(self, config,
                                                          index_name):
        custom_vector = [0.655] * DIMENSION
        rng = np.random.default_rng(0)
        docs = [
            {"_id": "1", "custom_field_1": {
                "content": "test custom field content_1",
                "vector": rng.random(DIMENSION).tolist()}},
            {"_id": "2", "custom_field_1": {
                "content": "test custom field content_2",
                "vector": custom_vector}},
        ]
        r = self._add(config, index_name, docs)
        assert r["errors"] is False, r
        res = tensor_search.search(
            config, index_name, text=None, search_method="TENSOR",
            context={"tensor": [{"vector": custom_vector, "weight": 1}]})
        assert len(res["hits"]) == 2
        assert res["hits"][0]["_id"] == "2"
        assert abs(res["hits"][0]["_score"] - 1) < 0.1
        assert res["hits"][1]["_id"] == "1"

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_no_model_and_context_vectors_dimension(self, config,
                                                    index_name):
        from marqo_tpu.core.exceptions import InvalidArgumentError
        with pytest.raises(InvalidArgumentError) as e:
            tensor_search.search(
                config, index_name, text=None,
                context={"tensor": [
                    {"vector": [1] * (DIMENSION + 1), "weight": -1},
                    {"vector": [1] * (DIMENSION + 1), "weight": 1}]})
        assert "does not match the expected dimension" in str(e.value)
