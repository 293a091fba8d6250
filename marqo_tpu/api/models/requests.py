"""API request models.

Parity: reference src/marqo/tensor_search/models/api_models.py (SearchQuery
:37-55), add-docs body (api/models/add_docs_objects.py), embed request,
recommend request, update-documents body.
"""

from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, ConfigDict, field_validator, model_validator

from marqo_tpu.core.models.add_docs_params import BatchVectorisationMode
from marqo_tpu.core.models.hybrid_parameters import HybridParameters, ScoreModifierLists


class CustomVector(BaseModel):
    model_config = ConfigDict(extra="forbid")
    content: Optional[str] = None
    vector: List[float]


class CustomVectorQuery(BaseModel):
    model_config = ConfigDict(extra="forbid")
    customVector: CustomVector


class SearchContextTensor(BaseModel):
    """One weighted context vector (reference models/search.py:61-63):
    `weight` is required, unknown keys are ignored (pydantic-v1 default) —
    so {"vector": [...], "weights": 1} fails on the MISSING weight, not
    the extra key."""
    model_config = ConfigDict(extra="ignore")
    vector: List[float]
    weight: float


class SearchContext(BaseModel):
    """Context vectors for a tensor query (reference models/search.py:66-78):
    1..64 tensors, each {"vector": [...], "weight": ...}; extra keys are
    ignored; any shape error surfaces as the API-level 400
    (InvalidArgError), never a bare pydantic error."""
    model_config = ConfigDict(extra="ignore")
    tensor: List[SearchContextTensor]

    def __init__(self, **data):
        from pydantic import ValidationError as PydanticValidationError

        from marqo_tpu.api.exceptions import InvalidArgError
        try:
            super().__init__(**data)
        except PydanticValidationError as e:
            raise InvalidArgError(str(e))

    @field_validator("tensor", mode="before")
    @classmethod
    def _check_tensor_count(cls, v):
        from marqo_tpu.api.exceptions import InvalidArgError
        try:
            n = len(v)
        except TypeError:
            raise InvalidArgError(
                "The number of tensors must be between 1 and 64")
        if not (1 <= n <= 64):
            raise InvalidArgError(
                "The number of tensors must be between 1 and 64")
        return v


class ModelAuth(BaseModel):
    """Reference private_models.py:13-27: at least one of s3/hf must be
    set (both together is accepted); missing-both is the API-level 400
    with the reference's message."""
    model_config = ConfigDict(extra="forbid", protected_namespaces=())
    s3: Optional[Dict[str, Any]] = None
    hf: Optional[Dict[str, Any]] = None

    @model_validator(mode="after")
    def _at_least_one(self):
        if self.s3 is None and self.hf is None:
            from marqo_tpu.api.exceptions import InvalidArgError
            raise InvalidArgError(
                "Missing authentication object. An authentic object, for "
                "example `s3` or  `hf`, must be provided. ")
        return self


class SearchQuery(BaseModel):
    model_config = ConfigDict(extra="forbid", protected_namespaces=())

    q: Optional[Union[str, Dict[str, float], CustomVectorQuery]] = None
    searchableAttributes: Optional[List[str]] = None
    searchMethod: str = "TENSOR"
    limit: int = 10
    offset: int = 0
    efSearch: Optional[int] = None
    approximate: Optional[bool] = None
    showHighlights: bool = True
    reRanker: Optional[str] = None
    filter: Optional[str] = None
    attributesToRetrieve: Optional[List[str]] = None
    boost: Optional[Dict] = None
    image_download_headers: Optional[Dict] = None
    mediaDownloadHeaders: Optional[Dict] = None
    context: Optional[SearchContext] = None
    scoreModifiers: Optional[ScoreModifierLists] = None
    modelAuth: Optional[ModelAuth] = None
    textQueryPrefix: Optional[str] = None
    hybridParameters: Optional[HybridParameters] = None
    exposeFacets: bool = False

    @field_validator("searchMethod", mode="before")
    @classmethod
    def _upper(cls, v):
        return "TENSOR" if v is None else str(v).upper()

    @model_validator(mode="after")
    def _query_or_context(self):
        if self.searchMethod in ("TENSOR", "HYBRID"):
            if self.q is None and self.context is None:
                raise ValueError(
                    f"One of Query(q) or context is required for "
                    f"{self.searchMethod} search but both are missing")
        else:
            if self.q is None:
                raise ValueError("Query(q) is required for lexical search")
        return self


class AddDocsBodyParams(BaseModel):
    model_config = ConfigDict(extra="forbid", protected_namespaces=())

    documents: List[Dict[str, Any]]
    tensorFields: Optional[List[str]] = None
    useExistingTensors: bool = False
    mappings: Optional[Dict[str, Dict[str, Any]]] = None
    modelAuth: Optional[ModelAuth] = None
    textChunkPrefix: Optional[str] = None
    imageDownloadHeaders: Optional[Dict[str, str]] = None
    mediaDownloadHeaders: Optional[Dict[str, str]] = None
    imageDownloadThreadCount: Optional[int] = None
    mediaDownloadThreadCount: Optional[int] = None
    # reference api/models/add_docs_objects.py:32 — experimental param
    batchVectorisationMode: BatchVectorisationMode = \
        BatchVectorisationMode.PER_DOCUMENT


class EmbedRequest(BaseModel):
    model_config = ConfigDict(extra="forbid", protected_namespaces=())

    content: Union[str, Dict[str, float], List[Union[str, Dict[str, float]]]]
    content_type: Optional[str] = "query"
    image_download_headers: Optional[Dict] = None
    mediaDownloadHeaders: Optional[Dict] = None
    modelAuth: Optional[ModelAuth] = None


class RecommendQuery(BaseModel):
    model_config = ConfigDict(extra="forbid")

    documents: Union[List[str], Dict[str, float]]
    tensorFields: Optional[List[str]] = None
    interpolationMethod: Optional[str] = None
    excludeInputDocuments: bool = True
    limit: int = 10
    offset: int = 0
    efSearch: Optional[int] = None
    approximate: Optional[bool] = None
    searchableAttributes: Optional[List[str]] = None
    filter: Optional[str] = None
    attributesToRetrieve: Optional[List[str]] = None
    scoreModifiers: Optional[ScoreModifierLists] = None
    showHighlights: bool = True


class UpdateDocumentsBodyParams(BaseModel):
    model_config = ConfigDict(extra="forbid")

    documents: List[Dict[str, Any]]


class IndexSettingsWithName(BaseModel):
    model_config = ConfigDict(extra="allow")

    indexName: str
