"""Add-documents request parameters.

Parity: reference core/models/add_docs_params.py — docs, tensor_fields
(required for unstructured/semi-structured), use_existing_tensors, mappings
(multimodal_combination / custom_vector), device, text_chunk_prefix,
model_auth, media download headers/thread counts.
"""

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict, field_validator


class AddDocsParams(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True,
                              protected_namespaces=())

    index_name: str
    docs: List[Dict[str, Any]]
    tensor_fields: Optional[List[str]] = None
    use_existing_tensors: bool = False
    device: Optional[str] = None
    mappings: Optional[Dict[str, Dict[str, Any]]] = None
    text_chunk_prefix: Optional[str] = None
    model_auth: Optional[Dict[str, Any]] = None
    media_download_headers: Optional[Dict[str, str]] = None
    image_download_thread_count: Optional[int] = None
    media_download_thread_count: Optional[int] = None

    @field_validator("docs")
    @classmethod
    def _docs_not_empty(cls, docs):
        if not docs:
            raise ValueError("Received empty add documents request")
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
                weights = mapping.get("weights")
                if not isinstance(weights, dict) or not weights:
                    raise ValueError(
                        f"multimodal_combination mapping for `{field}` must "
                        f"define non-empty `weights`")
        return mappings
