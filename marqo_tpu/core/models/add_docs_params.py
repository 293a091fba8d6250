"""Add-documents request parameters.

Parity: reference core/models/add_docs_params.py — docs, tensor_fields
(required for unstructured/semi-structured), use_existing_tensors, mappings
(multimodal_combination / custom_vector), device, text_chunk_prefix,
model_auth, media download headers/thread counts, and
batch_vectorisation_mode (reference add_docs_params.py:18-21,62 — default
PER_DOCUMENT).
"""

import enum
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict, field_validator


class BatchVectorisationMode(str, enum.Enum):
    """Vectorisation batching strategy (reference add_docs_params.py:18-21).

    The reference trades throughput for error isolation: PER_FIELD and
    PER_DOCUMENT make one model call per field/doc so a poisoned input
    fails only its doc, while PER_BATCH makes one call for everything and
    a failure kills the whole request. The TPU build keeps ONE large
    device batch in every mode (big batches are where the MXU lives) and
    recovers the isolation semantics on failure: if the batched encode
    raises, PER_DOCUMENT/PER_FIELD re-encode per doc/field to fail only
    the poisoned documents, while PER_BATCH propagates the reference's
    InternalError for the whole request.
    """
    PER_FIELD = "per_field"
    PER_DOCUMENT = "per_document"
    PER_BATCH = "per_batch"


class AddDocsParams(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True,
                              protected_namespaces=())

    index_name: str
    # items intentionally untyped (reference add_docs_params.py:48 accepts
    # Sequence[Union[dict, Any]]): a non-dict doc or non-string field name
    # must fail ONLY its own document in the per-item response, not the
    # whole request ("Docs must be dicts", test_add_documents_handler.py:181)
    docs: List[Any]
    tensor_fields: Optional[List[str]] = None
    use_existing_tensors: bool = False
    device: Optional[str] = None
    mappings: Optional[Dict[str, Dict[str, Any]]] = None
    text_chunk_prefix: Optional[str] = None
    model_auth: Optional[Dict[str, Any]] = None
    media_download_headers: Optional[Dict[str, str]] = None
    image_download_thread_count: Optional[int] = None
    media_download_thread_count: Optional[int] = None
    batch_vectorisation_mode: BatchVectorisationMode = \
        BatchVectorisationMode.PER_DOCUMENT

    @field_validator("docs")
    @classmethod
    def _docs_not_empty(cls, docs):
        # reference add_docs_params.py:78-94 validate_docs: BOTH the
        # empty check and the max-batch check raise BadRequestError
        # straight from the validator (not a pydantic ValueError), so
        # direct AddDocsParams construction surfaces a 400
        from marqo_tpu.api import configs
        from marqo_tpu.api.exceptions import BadRequestError
        if not docs:
            raise BadRequestError("Received empty add documents request")
        max_docs = configs.read_env_vars_and_defaults_ints(
            "MARQO_MAX_DOCUMENTS_BATCH_SIZE") or \
            configs.read_env_vars_and_defaults_ints(
                "MARQO_MAX_ADD_DOCS_COUNT")
        if max_docs is not None and len(docs) > max_docs:
            raise BadRequestError(
                f"Number of docs in add documents request ({len(docs)}) "
                f"exceeds limit of {max_docs}. If using the Python client, "
                f"break up your `add_documents` request into smaller "
                f"batches using its `client_batch_size` parameter. ")
        return docs

    @field_validator("mappings")
    @classmethod
    def _validate_mappings(cls, mappings):
        if mappings is None:
            return mappings
        for field, mapping in mappings.items():
            mtype = mapping.get("type")
            if mtype not in ("multimodal_combination", "custom_vector"):
                raise ValueError(
                    f"Invalid mapping type `{mtype}` for field `{field}`. "
                    f"Must be one of: multimodal_combination, custom_vector")
            if mtype == "multimodal_combination":
                # jsonschema parity (reference unstructured_validation
                # multimodal_combination_mappings_schema): exactly
                # {type, weights}; weights values numeric
                extra = set(mapping) - {"type", "weights"}
                if extra:
                    raise ValueError(
                        f"Error validating multimodal combination mappings "
                        f"object for `{field}`: unexpected keys "
                        f"{sorted(extra)}")
                weights = mapping.get("weights")
                if not isinstance(weights, dict) or not weights:
                    raise ValueError(
                        f"multimodal_combination mapping for `{field}` must "
                        f"define non-empty `weights`")
                for child, weight in weights.items():
                    if not isinstance(child, str) or \
                            isinstance(weight, bool) or \
                            not isinstance(weight, (int, float)):
                        raise ValueError(
                            f"Error validating multimodal combination "
                            f"mappings object for `{field}`: weight for "
                            f"`{child}` must be a number, got "
                            f"`{weight}`")
            elif mtype == "custom_vector":
                # custom_vector mappings carry ONLY the type key
                # (reference custom_vector_mappings_schema)
                extra = set(mapping) - {"type"}
                if extra:
                    raise ValueError(
                        f"Error validating custom vector mappings object "
                        f"for `{field}`: unexpected keys {sorted(extra)}")
        return mappings
