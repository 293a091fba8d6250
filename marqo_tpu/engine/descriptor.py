"""Engine index descriptor — the storage-engine contract for one index.

Role parity: the reference generates Vespa ``.sd`` schema text
(structured_vespa_schema.py:43-468, unstructured_vespa_schema.py:39) which
Vespa compiles into C++ structures. Our engine is configured directly with a
typed descriptor (serializable to JSON for the native engine): field types,
lexical/filter/score-modifier capabilities, tensor fields (dims + distance
metric + HNSW params), and model metadata.
"""

from dataclasses import dataclass, field as dc_field
from typing import Dict, List

from marqo_tpu.core.models.marqo_index import (DistanceMetric, FieldType,
                                               MarqoIndex, IndexType,
                                               SemiStructuredMarqoIndex,
                                               StructuredMarqoIndex,
                                               FieldFeature,
                                               UnstructuredMarqoIndex)


@dataclass
class TensorFieldDescriptor:
    name: str
    dimensions: int
    distance_metric: str = DistanceMetric.PrenormalizedAngular.value
    hnsw_m: int = 16
    hnsw_ef_construction: int = 512


@dataclass
class FieldDescriptor:
    name: str
    type: str = FieldType.Text.value
    lexical: bool = False
    filterable: bool = False
    score_modifier: bool = False


@dataclass
class IndexDescriptor:
    name: str
    index_type: str = IndexType.Unstructured.value
    model_dimensions: int = 0
    normalize_embeddings: bool = True
    fields: List[FieldDescriptor] = dc_field(default_factory=list)
    tensor_fields: List[TensorFieldDescriptor] = dc_field(default_factory=list)
    # unstructured/semi-structured: every string field is lexically
    # searchable and (below the length cap) filterable
    dynamic_fields: bool = True
    filter_string_max_length: int = 50
    # vector cell storage: "float32" | "bfloat16" (Vespa tensor cell-type /
    # marqo vectorNumericType, reference marqo_index.py VectorNumericType —
    # bfloat16 halves vector memory in both the store and the HNSW reads)
    cell_dtype: str = "float32"

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "index_type": self.index_type,
            "model_dimensions": self.model_dimensions,
            "normalize_embeddings": self.normalize_embeddings,
            "dynamic_fields": self.dynamic_fields,
            "filter_string_max_length": self.filter_string_max_length,
            "cell_dtype": self.cell_dtype,
            "fields": [vars(f) for f in self.fields],
            "tensor_fields": [vars(t) for t in self.tensor_fields],
        }

    @classmethod
    def from_json(cls, data: dict) -> "IndexDescriptor":
        return cls(
            name=data["name"],
            index_type=data.get("index_type", IndexType.Unstructured.value),
            model_dimensions=data.get("model_dimensions", 0),
            normalize_embeddings=data.get("normalize_embeddings", True),
            dynamic_fields=data.get("dynamic_fields", True),
            filter_string_max_length=data.get("filter_string_max_length", 50),
            cell_dtype=data.get("cell_dtype", "float32"),
            fields=[FieldDescriptor(**f) for f in data.get("fields", [])],
            tensor_fields=[TensorFieldDescriptor(**t)
                           for t in data.get("tensor_fields", [])],
        )

    @property
    def field_map(self) -> Dict[str, FieldDescriptor]:
        return {f.name: f for f in self.fields}

    @property
    def tensor_field_map(self) -> Dict[str, TensorFieldDescriptor]:
        return {t.name: t for t in self.tensor_fields}


def descriptor_from_marqo_index(index: MarqoIndex) -> IndexDescriptor:
    """Generate the engine descriptor from index settings — our analogue of
    the reference's schema generation (vespa_schema.py factory dispatch)."""
    dims = index.model.get_dimension()
    common = dict(
        name=index.schema_name,
        index_type=index.type.value,
        model_dimensions=dims,
        normalize_embeddings=index.normalize_embeddings,
        # vectorNumericType → engine cell storage (bfloat16 halves memory)
        cell_dtype=("bfloat16" if getattr(index, "vector_numeric_type", None)
                    is not None and
                    index.vector_numeric_type.value == "bfloat16"
                    else "float32"),
    )
    metric = index.distance_metric.value
    hnsw = index.hnsw_config

    if isinstance(index, StructuredMarqoIndex):
        fields = [
            FieldDescriptor(
                name=f.name, type=f.type.value,
                lexical=FieldFeature.LexicalSearch in f.features,
                filterable=FieldFeature.Filter in f.features,
                score_modifier=FieldFeature.ScoreModifier in f.features)
            for f in index.fields
        ]
        tensor_fields = [
            TensorFieldDescriptor(name=tf.name, dimensions=dims,
                                  distance_metric=metric,
                                  hnsw_m=hnsw.m,
                                  hnsw_ef_construction=hnsw.ef_construction)
            for tf in index.tensor_fields
        ]
        return IndexDescriptor(**common, fields=fields,
                               tensor_fields=tensor_fields,
                               dynamic_fields=False)

    # unstructured/semi-structured: dynamic everything
    desc = IndexDescriptor(**common, dynamic_fields=True)
    if isinstance(index, (UnstructuredMarqoIndex, SemiStructuredMarqoIndex)):
        desc.filter_string_max_length = index.filter_string_max_length
    if isinstance(index, SemiStructuredMarqoIndex):
        desc.fields = [
            FieldDescriptor(name=f.name, type=f.type.value, lexical=True,
                            filterable=True, score_modifier=True)
            for f in index.lexical_fields
        ]
        desc.tensor_fields = [
            TensorFieldDescriptor(name=tf.name, dimensions=dims,
                                  distance_metric=metric, hnsw_m=hnsw.m,
                                  hnsw_ef_construction=hnsw.ef_construction)
            for tf in index.tensor_fields
        ]
    return desc
