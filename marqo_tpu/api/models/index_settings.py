"""API-facing index settings model → MarqoIndex conversion.

Parity: reference src/marqo/tensor_search/models/index_settings.py —
camelCase keys, default type semi-structured, default model hf/e5-base-v2,
AnnParameters(spaceType + HnswConfig), prefix resolution from the registry.
"""

import time
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict, model_validator

import marqo_tpu.core.models.marqo_index as core
from marqo_tpu.version import __version__


def _default_vector_numeric_type() -> "core.VectorNumericType":
    """Operator-level default cell type for indexes created WITHOUT an
    explicit vectorNumericType: MARQO_ENGINE_CELL_TYPE=float32|bfloat16
    (api/configs.py). Lets a deployment halve vector memory fleet-wide
    (Vespa bfloat16 tensor-cell option) without touching client settings
    documents; an explicit vectorNumericType always wins."""
    from marqo_tpu.api import configs
    raw = str(configs.read_env_vars_and_defaults(
        "MARQO_ENGINE_CELL_TYPE") or "float32").lower()
    return (core.VectorNumericType.Bfloat16 if raw == "bfloat16"
            else core.VectorNumericType.Float)


class FieldRequest(BaseModel):
    model_config = ConfigDict(extra="forbid")

    name: str
    type: core.FieldType
    features: List[core.FieldFeature] = []
    dependentFields: Optional[Dict[str, float]] = None


class AnnParameters(BaseModel):
    model_config = ConfigDict(extra="forbid")

    spaceType: core.DistanceMetric = core.DistanceMetric.PrenormalizedAngular
    parameters: core.HnswConfig = core.HnswConfig()


class IndexSettings(BaseModel):
    model_config = ConfigDict(extra="forbid", protected_namespaces=())

    type: core.IndexType = core.IndexType.SemiStructured
    allFields: Optional[List[FieldRequest]] = None
    tensorFields: Optional[List[str]] = None
    treatUrlsAndPointersAsImages: Optional[bool] = None
    treatUrlsAndPointersAsMedia: Optional[bool] = None
    filterStringMaxLength: Optional[int] = None
    model: str = "hf/e5-base-v2"
    modelProperties: Optional[Dict[str, Any]] = None
    textQueryPrefix: Optional[str] = None
    textChunkPrefix: Optional[str] = None
    normalizeEmbeddings: bool = True
    textPreprocessing: core.TextPreProcessing = core.TextPreProcessing()
    imagePreprocessing: core.ImagePreProcessing = core.ImagePreProcessing()
    # reference defaults video/audio preprocessing blocks rather than
    # omitting them (index_settings.py:39-46)
    videoPreprocessing: Optional[core.VideoPreProcessing] = \
        core.VideoPreProcessing(split_length=20, split_overlap=3)
    audioPreprocessing: Optional[core.AudioPreProcessing] = \
        core.AudioPreProcessing(split_length=10, split_overlap=3)
    # None = not specified by the caller: resolved at create time from
    # MARQO_ENGINE_CELL_TYPE (operator default, float32 unless overridden)
    # so a deployment can opt whole fleets into bfloat16 cells without
    # clients changing their settings documents. Stored/rendered settings
    # always carry the resolved value (reference default: "float").
    vectorNumericType: Optional[core.VectorNumericType] = None
    annParameters: AnnParameters = AnnParameters()
    numberOfShards: Optional[int] = None
    numberOfReplicas: Optional[int] = None
    numberOfInferences: Optional[int] = None
    inferenceType: Optional[str] = None
    storageClass: Optional[str] = None

    @model_validator(mode="before")
    @classmethod
    def _reject_snake_case_keys(cls, values):
        """Snake-case spellings of camelCase keys are rejected anywhere in
        the payload — recursively, except inside dependentFields /
        modelProperties whose keys are user data (reference
        index_settings.py:77-94 validate_field_names; surfaces as the 422
        "Invalid field name 'dependent_fields'" the reference API returns).
        """
        from marqo_tpu import marqo_docs

        def validate_keys(d):
            if isinstance(d, dict):
                for key in d.keys():
                    if isinstance(key, str) and "_" in key:
                        raise ValueError(
                            f"Invalid field name '{key}'. See Create Index "
                            f"API reference here {marqo_docs.create_index()}")
                    if key not in ("dependentFields", "modelProperties"):
                        validate_keys(d[key])
            elif isinstance(d, list):
                for item in d:
                    validate_keys(item)

        if isinstance(values, dict):
            validate_keys(values)
        return values

    @model_validator(mode="after")
    def _validate_ef_construction_cap(self):
        """efConstruction upper bound (reference
        MARQO_EF_CONSTRUCTION_MAX_VALUE, api/configs.py:43)."""
        from marqo_tpu.api import configs
        cap = configs.read_env_vars_and_defaults_ints(
            "MARQO_EF_CONSTRUCTION_MAX_VALUE")
        if cap is not None and self.annParameters.parameters.ef_construction > cap:
            raise ValueError(
                f"efConstruction must be ≤ {cap} "
                f"(MARQO_EF_CONSTRUCTION_MAX_VALUE), got "
                f"{self.annParameters.parameters.ef_construction}")
        return self

    @model_validator(mode="after")
    def _validate_media_flags(self):
        if self.treatUrlsAndPointersAsImages is False and \
                self.treatUrlsAndPointersAsMedia:
            raise ValueError(
                "Invalid combination: 'treatUrlsAndPointersAsImages' cannot "
                "be False when 'treatUrlsAndPointersAsMedia' is True.")
        if self.treatUrlsAndPointersAsMedia:
            object.__setattr__(self, "treatUrlsAndPointersAsImages", True)
        return self

    @model_validator(mode="after")
    def _validate_type_specific(self):
        if self.type == core.IndexType.Structured:
            if self.treatUrlsAndPointersAsImages is not None:
                raise ValueError(
                    "treatUrlsAndPointersAsImages is not a valid parameter "
                    "for structured indexes")
            if self.filterStringMaxLength is not None:
                raise ValueError(
                    "filterStringMaxLength is not a valid parameter for "
                    "structured indexes")
        else:
            if self.allFields is not None:
                raise ValueError(
                    "allFields is not a valid parameter for unstructured "
                    "indexes")
            if self.tensorFields is not None:
                raise ValueError(
                    "tensorFields is not a valid parameter for unstructured "
                    "indexes")
        return self

    def _build_model(self) -> core.Model:
        model = core.Model(
            name=self.model,
            properties=self.modelProperties,
            custom=self.modelProperties is not None,
            text_query_prefix=self.textQueryPrefix,
            text_chunk_prefix=self.textChunkPrefix,
        )
        # resolve default prefixes from the registry at creation time
        # (reference index_management.py:151-155)
        if model.text_query_prefix is None:
            model.text_query_prefix = model.get_default_text_query_prefix()
        if model.text_chunk_prefix is None:
            model.text_chunk_prefix = model.get_default_text_chunk_prefix()
        return model

    def to_marqo_index(self, index_name: str) -> core.MarqoIndex:
        now = int(time.time())
        common = dict(
            name=index_name,
            schema_name=index_name,
            model=self._build_model(),
            normalize_embeddings=self.normalizeEmbeddings,
            text_preprocessing=self.textPreprocessing,
            image_preprocessing=self.imagePreprocessing,
            video_preprocessing=self.videoPreprocessing,
            audio_preprocessing=self.audioPreprocessing,
            distance_metric=self.annParameters.spaceType,
            vector_numeric_type=(self.vectorNumericType or
                                 _default_vector_numeric_type()),
            hnsw_config=self.annParameters.parameters,
            marqo_version=__version__,
            created_at=now,
            updated_at=now,
            version=1,
        )
        if self.type == core.IndexType.Structured:
            tensor_names = self.tensorFields or []
            fields = []
            for f in (self.allFields or []):
                lexical_name = (f"marqo__lexical_{f.name}"
                                if core.FieldFeature.LexicalSearch in f.features
                                else None)
                filter_name = (f"marqo__filter_{f.name}"
                               if core.FieldFeature.Filter in f.features
                               else None)
                fields.append(core.Field(
                    name=f.name, type=f.type, features=f.features,
                    lexical_field_name=lexical_name,
                    filter_field_name=filter_name,
                    dependent_fields=f.dependentFields))
            tensor_fields = [
                core.TensorField(
                    name=name,
                    chunk_field_name=f"marqo__chunks_{name}",
                    embeddings_field_name=f"marqo__embeddings_{name}")
                for name in tensor_names
            ]
            return core.StructuredMarqoIndex(
                **common, type=core.IndexType.Structured,
                fields=fields, tensor_fields=tensor_fields)
        elif self.type == core.IndexType.Unstructured:
            return core.UnstructuredMarqoIndex(
                **common, type=core.IndexType.Unstructured,
                treat_urls_and_pointers_as_images=bool(
                    self.treatUrlsAndPointersAsImages),
                treat_urls_and_pointers_as_media=bool(
                    self.treatUrlsAndPointersAsMedia),
                filter_string_max_length=self.filterStringMaxLength or 50)
        else:
            return core.SemiStructuredMarqoIndex(
                **common, type=core.IndexType.SemiStructured,
                treat_urls_and_pointers_as_images=bool(
                    self.treatUrlsAndPointersAsImages),
                treat_urls_and_pointers_as_media=bool(
                    self.treatUrlsAndPointersAsMedia),
                filter_string_max_length=self.filterStringMaxLength or 50,
                lexical_fields=[], tensor_fields=[])

    @classmethod
    def from_marqo_index(cls, index: core.MarqoIndex) -> dict:
        """Render index settings for GET /indexes/{name}/settings
        (reference IndexSettings.from_marqo_index)."""
        # semi-structured is an internal implementation detail: the API
        # reports it as "unstructured" (reference index_settings.py:202-206)
        api_type = ("unstructured"
                    if index.type == core.IndexType.SemiStructured
                    else index.type.value)
        result: Dict[str, Any] = {
            "type": api_type,
            "model": index.model.name,
            "normalizeEmbeddings": index.normalize_embeddings,
            "textPreprocessing": {
                "splitLength": index.text_preprocessing.split_length,
                "splitOverlap": index.text_preprocessing.split_overlap,
                "splitMethod": index.text_preprocessing.split_method.value,
            },
            "imagePreprocessing": (
                {"patchMethod": index.image_preprocessing.patch_method.value}
                if index.image_preprocessing.patch_method else {}),
            "vectorNumericType": index.vector_numeric_type.value,
            "annParameters": {
                "spaceType": index.distance_metric.value,
                "parameters": {
                    "efConstruction": index.hnsw_config.ef_construction,
                    "m": index.hnsw_config.m,
                },
            },
        }
        if index.video_preprocessing is not None:
            result["videoPreprocessing"] = {
                "splitLength": index.video_preprocessing.split_length,
                "splitOverlap": index.video_preprocessing.split_overlap,
            }
        if index.audio_preprocessing is not None:
            result["audioPreprocessing"] = {
                "splitLength": index.audio_preprocessing.split_length,
                "splitOverlap": index.audio_preprocessing.split_overlap,
            }
        if index.model.custom and index.model.properties:
            result["modelProperties"] = index.model.properties
        # NB: textQueryPrefix/textChunkPrefix are intentionally ABSENT —
        # the reference's from_marqo_index (index_settings.py:202-242)
        # never renders them back, even when user-set (test_get_settings
        # default-settings goldens pin the exact dict)
        if isinstance(index, core.StructuredMarqoIndex):
            result["allFields"] = [
                {
                    "name": f.name, "type": f.type.value,
                    "features": [feat.value for feat in f.features],
                    **({"dependentFields": f.dependent_fields}
                       if f.dependent_fields else {}),
                }
                for f in index.fields
            ]
            result["tensorFields"] = [tf.name for tf in index.tensor_fields]
        elif isinstance(index, core.UnstructuredMarqoIndex):
            result["treatUrlsAndPointersAsImages"] = \
                index.treat_urls_and_pointers_as_images
            result["treatUrlsAndPointersAsMedia"] = \
                index.treat_urls_and_pointers_as_media
            result["filterStringMaxLength"] = index.filter_string_max_length
        return result
