"""Engine-descriptor golden tests.

Role parity: the reference compares generated Vespa .sd text against
fixture files (tests/core/*_vespa_index/test_schemas/, SURVEY.md §4).
Our schema artifact is the JSON engine descriptor — these tests pin its
exact shape so schema-generation regressions are caught the same way."""

import pytest

from marqo_tpu.api.models.index_settings import (FieldRequest, IndexSettings)
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.engine.descriptor import descriptor_from_marqo_index

GOLDEN_STRUCTURED = {
    "name": "golden-structured",
    "index_type": "structured",
    "model_dimensions": 16,
    "normalize_embeddings": True,
    "dynamic_fields": False,
    "filter_string_max_length": 50,
    "cell_dtype": "float32",
    "fields": [
        {"name": "title", "type": "text", "lexical": True,
         "filterable": False, "score_modifier": False},
        {"name": "price", "type": "float", "lexical": False,
         "filterable": True, "score_modifier": True},
    ],
    "tensor_fields": [
        {"name": "title", "dimensions": 16,
         "distance_metric": "prenormalized-angular",
         "hnsw_m": 16, "hnsw_ef_construction": 512},
    ],
}

GOLDEN_SEMI = {
    "name": "golden-semi",
    "index_type": "semi-structured",
    "model_dimensions": 16,
    "normalize_embeddings": True,
    "dynamic_fields": True,
    "filter_string_max_length": 30,
    "cell_dtype": "float32",
    "fields": [],
    "tensor_fields": [],
}


GOLDEN_BF16 = {
    "name": "golden-bf16",
    "index_type": "semi-structured",
    "model_dimensions": 16,
    "normalize_embeddings": True,
    "dynamic_fields": True,
    "filter_string_max_length": 50,
    "cell_dtype": "bfloat16",
    "fields": [],
    "tensor_fields": [],
}


class TestDescriptorGolden:
    def test_structured(self):
        settings = IndexSettings(
            type=IndexType.Structured, model="test",
            allFields=[
                FieldRequest(name="title", type=FieldType.Text,
                             features=[FieldFeature.LexicalSearch]),
                FieldRequest(name="price", type=FieldType.Float,
                             features=[FieldFeature.Filter,
                                       FieldFeature.ScoreModifier]),
            ],
            tensorFields=["title"])
        index = settings.to_marqo_index("golden-structured")
        assert descriptor_from_marqo_index(index).to_json() == \
            GOLDEN_STRUCTURED

    def test_semi_structured(self):
        settings = IndexSettings(model="test", filterStringMaxLength=30)
        index = settings.to_marqo_index("golden-semi")
        assert descriptor_from_marqo_index(index).to_json() == GOLDEN_SEMI

    def test_bfloat16_cells(self):
        # vectorNumericType=bfloat16 (reference marqo_index.py
        # VectorNumericType) → engine bfloat16 cell storage
        settings = IndexSettings(model="test",
                                 vectorNumericType="bfloat16")
        index = settings.to_marqo_index("golden-bf16")
        assert descriptor_from_marqo_index(index).to_json() == GOLDEN_BF16

    def test_roundtrip(self):
        from marqo_tpu.engine.descriptor import IndexDescriptor
        desc = IndexDescriptor.from_json(GOLDEN_STRUCTURED)
        assert desc.to_json() == GOLDEN_STRUCTURED
        assert desc.tensor_field_map["title"].hnsw_m == 16

    def test_hnsw_params_flow_through(self):
        settings = IndexSettings(
            model="test",
            annParameters={"spaceType": "angular",
                           "parameters": {"efConstruction": 200, "m": 32}})
        index = settings.to_marqo_index("custom-ann")
        desc = descriptor_from_marqo_index(index)
        # semi-structured: tensor fields appear on first add; metric applies
        # via the marqo index, checked when fields exist
        assert index.hnsw_config.m == 32
        assert index.distance_metric.value == "angular"
        assert desc.index_type == "semi-structured"
