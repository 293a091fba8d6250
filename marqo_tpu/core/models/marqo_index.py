"""Index domain model.

Parity: reference src/marqo/core/models/marqo_index.py:23-633 — 3 index
types, 20 field types, field features, 6 distance metrics, HNSW config,
per-modality preprocessing configs, registry-backed Model, name/field
validation. Rewritten for pydantic v2 with functools-cached derived maps.
"""

import re
import time
from enum import Enum
from functools import cached_property
from typing import Any, Dict, List, Optional, Set

from pydantic import BaseModel, ConfigDict, Field as PydanticField, field_validator, model_validator

from marqo_tpu.core import constants
from marqo_tpu.exceptions import InvalidArgumentError


class IndexType(str, Enum):
    Structured = "structured"
    Unstructured = "unstructured"
    SemiStructured = "semi-structured"


class FieldType(str, Enum):
    Text = "text"
    Bool = "bool"
    Int = "int"
    Long = "long"
    Float = "float"
    Double = "double"
    ArrayText = "array<text>"
    ArrayInt = "array<int>"
    ArrayLong = "array<long>"
    ArrayFloat = "array<float>"
    ArrayDouble = "array<double>"
    ImagePointer = "image_pointer"
    VideoPointer = "video_pointer"
    AudioPointer = "audio_pointer"
    MultimodalCombination = "multimodal_combination"
    CustomVector = "custom_vector"
    MapInt = "map<text, int>"
    MapLong = "map<text, long>"
    MapFloat = "map<text, float>"
    MapDouble = "map<text, double>"


class VectorNumericType(str, Enum):
    Float = "float"
    Bfloat16 = "bfloat16"


class FieldFeature(str, Enum):
    LexicalSearch = "lexical_search"
    ScoreModifier = "score_modifier"
    Filter = "filter"


class DistanceMetric(str, Enum):
    Euclidean = "euclidean"
    Angular = "angular"
    DotProduct = "dotproduct"
    PrenormalizedAngular = "prenormalized-angular"
    Geodegrees = "geodegrees"
    Hamming = "hamming"


class TextSplitMethod(str, Enum):
    Character = "character"
    Word = "word"
    Sentence = "sentence"
    Passage = "passage"


class PatchMethod(str, Enum):
    Simple = "simple"
    Frcnn = "frcnn"
    DinoV1 = "dino-v1"
    DinoV2 = "dino-v2"
    MarqoYolo = "marqo-yolo"


# --- name validation ----------------------------------------------------

_FIELD_NAME_PATTERN = r"[a-zA-Z_][a-zA-Z0-9_]*"
_INDEX_NAME_PATTERN = r"[a-zA-Z_-][a-zA-Z0-9_-]*"
_FIELD_NAME_REGEX = re.compile(_FIELD_NAME_PATTERN)
_INDEX_NAME_REGEX = re.compile(_INDEX_NAME_PATTERN)


def validate_index_name(name: str) -> None:
    if not isinstance(name, str) or _INDEX_NAME_REGEX.fullmatch(name) is None:
        raise ValueError(
            f'"{name}" is not a valid index name. Index name must match '
            f'{_INDEX_NAME_PATTERN} and must not start with '
            f'"{constants.MARQO_RESERVED_PREFIX}"')
    if name.startswith(constants.MARQO_RESERVED_PREFIX):
        raise ValueError(
            f'Index name must not start with "{constants.MARQO_RESERVED_PREFIX}"')


def validate_field_name(name: str) -> None:
    if not isinstance(name, str) or _FIELD_NAME_REGEX.fullmatch(name) is None:
        raise ValueError(
            f'"{name}": Field name must match {_FIELD_NAME_PATTERN} and must '
            f'not start with "{constants.MARQO_RESERVED_PREFIX}"')
    if name.startswith(constants.MARQO_RESERVED_PREFIX):
        raise ValueError(
            f'{name}: Field name must not start with '
            f'"{constants.MARQO_RESERVED_PREFIX}"')
    if name in constants.PROTECTED_FIELD_NAMES:
        raise ValueError(
            f'{name}: Field name must not be one of '
            f'{", ".join(constants.PROTECTED_FIELD_NAMES)}')


# --- sub-models ----------------------------------------------------------

class Field(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid")

    name: str
    type: FieldType
    features: List[FieldFeature] = []
    lexical_field_name: Optional[str] = None
    filter_field_name: Optional[str] = None
    dependent_fields: Optional[Dict[str, float]] = None

    @field_validator("name")
    @classmethod
    def _validate_name(cls, v):
        validate_field_name(v)
        return v

    @model_validator(mode="after")
    def _validate_features(self):
        if self.type == FieldType.MultimodalCombination:
            if not self.dependent_fields:
                raise ValueError(
                    f"Field {self.name}: dependent_fields must be defined for "
                    f"field type {self.type.value}")
        elif self.dependent_fields:
            raise ValueError(
                f"Field {self.name}: dependent_fields can only be defined for "
                f"field type {FieldType.MultimodalCombination.value}")
        return self


class TensorField(BaseModel):
    """A tensor field with engine-side chunk + embeddings storage names."""
    model_config = ConfigDict(frozen=True, extra="forbid")

    name: str
    chunk_field_name: str
    embeddings_field_name: str


class HnswConfig(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid", populate_by_name=True)

    ef_construction: int = PydanticField(512, gt=0, alias="efConstruction")
    m: int = PydanticField(16, gt=0)


class TextPreProcessing(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid", populate_by_name=True)

    split_length: int = PydanticField(2, gt=0, alias="splitLength")
    split_overlap: int = PydanticField(0, ge=0, alias="splitOverlap")
    split_method: TextSplitMethod = PydanticField(TextSplitMethod.Sentence,
                                                  alias="splitMethod")


class ImagePreProcessing(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid", populate_by_name=True)

    patch_method: Optional[PatchMethod] = PydanticField(None, alias="patchMethod")


class VideoPreProcessing(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid", populate_by_name=True)

    split_length: int = PydanticField(20, gt=0, alias="splitLength")
    split_overlap: int = PydanticField(3, ge=0, alias="splitOverlap")


class AudioPreProcessing(BaseModel):
    model_config = ConfigDict(frozen=True, extra="forbid", populate_by_name=True)

    # reference default: audio splits 10s windows, video 20s
    # (tensor_search/models/index_settings.py:39-46)
    split_length: int = PydanticField(10, gt=0, alias="splitLength")
    split_overlap: int = PydanticField(3, ge=0, alias="splitOverlap")


class Model(BaseModel):
    """Embedding model reference with registry-backed properties
    (reference marqo_index.py:135-245)."""
    model_config = ConfigDict(extra="forbid", validate_assignment=False,
                              protected_namespaces=())

    name: str
    properties: Optional[Dict[str, Any]] = None
    custom: bool = False
    text_query_prefix: Optional[str] = None
    text_chunk_prefix: Optional[str] = None

    @model_validator(mode="after")
    def _validate_custom_properties(self):
        """Custom model-properties validation at index-settings time
        (reference s2_inference.py:345-420 validate_model_properties):
        'dimensions' must be a positive int; no_model requires BOTH
        model name and type to be 'no_model'."""
        props = self.properties
        if props is None:
            return self
        if "dimensions" in props or props.get("type") in ("no_model",):
            dimensions = props.get("dimensions")
            if (dimensions is None or isinstance(dimensions, bool)
                    or not isinstance(dimensions, int) or dimensions < 1):
                raise ValueError(
                    f"Invalid model properties: 'dimensions' must be a "
                    f"positive integer, but received {dimensions}.")
        if props.get("type") == "no_model" and self.name != "no_model":
            raise ValueError(
                f"Invalid model properties: To use the 'no_model' feature, "
                f"you must provide 'model = no_model' and "
                f"'type = no_model', but received 'model = {self.name}' "
                f"and 'type = {props.get('type')}'.")
        if self.name == "no_model" and props.get("type") != "no_model":
            raise ValueError(
                f"Invalid model properties: To use the 'no_model' feature, "
                f"you must provide 'model = no_model' and "
                f"'type = no_model', but received 'model = {self.name}' "
                f"and 'type = {props.get('type')}'.")
        return self

    def get_properties(self) -> Dict[str, Any]:
        self._update_properties_from_registry()
        return self.properties

    def get_dimension(self) -> int:
        self._update_properties_from_registry()
        try:
            return int(self.properties["dimensions"])
        except (KeyError, TypeError):
            raise InvalidArgumentError(
                "The given model properties does not contain a 'dimensions' key")

    def _update_properties_from_registry(self) -> None:
        if not self.properties:
            from marqo_tpu.inference.model_registry import (
                get_model_properties_from_registry)
            from marqo_tpu.core.exceptions import ModelError
            try:
                object.__setattr__(
                    self, "properties",
                    get_model_properties_from_registry(self.name))
            except ModelError:
                raise InvalidArgumentError(
                    f"Could not find model properties for model={self.name}. "
                    f"Please check that the model name is correct. Please "
                    f"provide model_properties if the model is a custom model "
                    f"and is not supported by default")

    def get_text_query_prefix(self, request_level_prefix: Optional[str] = None) -> str:
        if request_level_prefix is not None:
            return request_level_prefix
        return self.text_query_prefix or ""

    def get_text_chunk_prefix(self, request_level_prefix: Optional[str] = None) -> str:
        if request_level_prefix is not None:
            return request_level_prefix
        return self.text_chunk_prefix or ""

    def get_default_text_query_prefix(self) -> Optional[str]:
        return self.get_properties().get("text_query_prefix")

    def get_default_text_chunk_prefix(self) -> Optional[str]:
        return self.get_properties().get("text_chunk_prefix")


# --- index models ----------------------------------------------------------

class MarqoIndex(BaseModel):
    """Base index settings model. ``extra="allow"`` keeps us forward-
    compatible when deserializing settings written by newer versions
    (same rationale as the reference)."""
    model_config = ConfigDict(extra="allow", protected_namespaces=())

    name: str
    schema_name: str
    type: IndexType
    model: Model
    normalize_embeddings: bool = True
    text_preprocessing: TextPreProcessing = TextPreProcessing()
    image_preprocessing: ImagePreProcessing = ImagePreProcessing()
    video_preprocessing: Optional[VideoPreProcessing] = None
    audio_preprocessing: Optional[AudioPreProcessing] = None
    distance_metric: DistanceMetric = DistanceMetric.PrenormalizedAngular
    vector_numeric_type: VectorNumericType = VectorNumericType.Float
    hnsw_config: HnswConfig = HnswConfig()
    marqo_version: str = "2.13.0"
    created_at: int = PydanticField(default_factory=lambda: int(time.time()), gt=0)
    updated_at: int = PydanticField(default_factory=lambda: int(time.time()), gt=0)
    version: Optional[int] = None

    @field_validator("name")
    @classmethod
    def _validate_name(cls, v):
        validate_index_name(v)
        return v

    @classmethod
    def parse_obj(cls, obj: Dict[str, Any]) -> "MarqoIndex":
        """Polymorphic deserialization by ``type``."""
        if not isinstance(obj, dict):
            obj = dict(obj)
        index_type = obj.get("type")
        if index_type == IndexType.Structured.value:
            return StructuredMarqoIndex(**obj)
        elif index_type == IndexType.Unstructured.value:
            return UnstructuredMarqoIndex(**obj)
        elif index_type == IndexType.SemiStructured.value:
            return SemiStructuredMarqoIndex(**obj)
        raise InvalidArgumentError(f"Invalid or missing index type in {obj}")


class UnstructuredMarqoIndex(MarqoIndex):
    type: IndexType = IndexType.Unstructured
    treat_urls_and_pointers_as_images: bool = False
    treat_urls_and_pointers_as_media: Optional[bool] = None
    filter_string_max_length: int = 50


class StructuredMarqoIndex(MarqoIndex):
    type: IndexType = IndexType.Structured
    fields: List[Field] = []
    tensor_fields: List[TensorField] = []

    @model_validator(mode="after")
    def _validate_tensor_fields(self):
        field_names = {f.name for f in self.fields}
        for tf in self.tensor_fields:
            if tf.name not in field_names:
                raise ValueError(
                    f"Tensor field {tf.name} is not a defined field. "
                    f"Field names: {', '.join(sorted(field_names))}")
        return self

    @cached_property
    def field_map(self) -> Dict[str, Field]:
        return {f.name: f for f in self.fields}

    @cached_property
    def lexical_field_map(self) -> Dict[str, Field]:
        return {f.lexical_field_name: f for f in self.fields
                if FieldFeature.LexicalSearch in f.features}

    @cached_property
    def filter_field_map(self) -> Dict[str, Field]:
        return {f.filter_field_name: f for f in self.fields
                if FieldFeature.Filter in f.features}

    @cached_property
    def lexically_searchable_fields_names(self) -> Set[str]:
        return {f.name for f in self.fields
                if FieldFeature.LexicalSearch in f.features}

    @cached_property
    def filterable_fields_names(self) -> Set[str]:
        # `_id` became filterable in 2.2.0 (reference marqo_index.py
        # filterable_fields_names version gate; test_marqo_index.py:12-72)
        names = {f.name for f in self.fields
                 if FieldFeature.Filter in f.features}
        try:
            major, minor = (int(x) for x in
                            str(self.marqo_version).split(".")[:2])
            if (major, minor) >= (2, 2):
                names |= {constants.MARQO_DOC_ID}
        except ValueError:
            names |= {constants.MARQO_DOC_ID}
        return names

    @cached_property
    def score_modifier_fields_names(self) -> Set[str]:
        return {f.name for f in self.fields
                if FieldFeature.ScoreModifier in f.features}

    @cached_property
    def tensor_field_map(self) -> Dict[str, TensorField]:
        return {tf.name: tf for tf in self.tensor_fields}

    @cached_property
    def field_map_by_type(self) -> Dict[FieldType, List[Field]]:
        result: Dict[FieldType, List[Field]] = {ft: [] for ft in FieldType}
        for f in self.fields:
            result[f.type].append(f)
        return result

    @cached_property
    def dependent_fields_names(self) -> Set[str]:
        return {dep for f in self.fields if f.dependent_fields
                for dep in f.dependent_fields}


class SemiStructuredMarqoIndex(UnstructuredMarqoIndex):
    """Unstructured storage + dynamically grown lexical/tensor fields
    (reference marqo_index.py:504-581; default type for new indexes)."""
    type: IndexType = IndexType.SemiStructured
    lexical_fields: List[Field] = []
    tensor_fields: List[TensorField] = []

    @property
    def field_map(self) -> Dict[str, Field]:
        return {f.name: f for f in self.lexical_fields}

    @property
    def lexical_field_map(self) -> Dict[str, Field]:
        return {f.lexical_field_name: f for f in self.lexical_fields}

    @property
    def lexically_searchable_fields_names(self) -> Set[str]:
        return {f.name for f in self.lexical_fields}

    @property
    def tensor_field_map(self) -> Dict[str, TensorField]:
        return {tf.name: tf for tf in self.tensor_fields}
