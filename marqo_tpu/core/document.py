"""Document service: partial updates, delete-all.

Parity: reference src/marqo/core/document/document.py — partial updates are
supported for structured indexes only (:107-109 raises UnsupportedFeature
for unstructured), duplicate removal keeps the last occurrence (:173-200).
"""

import time
from typing import Dict, List, Tuple

from marqo_tpu.core import constants
from marqo_tpu.core.exceptions import UnsupportedFeatureError
from marqo_tpu.core.models.marqo_index import (FieldType,
                                               SemiStructuredMarqoIndex,
                                               StructuredMarqoIndex)

_UPDATABLE_TYPES = {
    FieldType.Bool, FieldType.Int, FieldType.Long, FieldType.Float,
    FieldType.Double, FieldType.ArrayText, FieldType.ArrayInt,
    FieldType.ArrayLong, FieldType.MapInt,
    FieldType.MapLong, FieldType.MapFloat, FieldType.MapDouble,
    FieldType.Text,
}


def _validate_update_value(field: str, field_type: FieldType, value):
    """Declared-type value validation for partial updates (reference
    test_update_with_incorrect_field_value: wrong-typed values are
    per-item 400s, strings are never coerced)."""
    def err(expected: str) -> str:
        return (f"Field `{field}` of type {field_type.value}: value "
                f"`{value}` is not a valid {expected}")

    is_bool = isinstance(value, bool)
    if field_type in (FieldType.Int, FieldType.Long):
        if is_bool or not isinstance(value, int):
            return err("integer")
    elif field_type in (FieldType.Float, FieldType.Double):
        if is_bool or not isinstance(value, (int, float)):
            return err("float")
    elif field_type == FieldType.Bool:
        if not is_bool:
            return err("boolean")
    elif field_type == FieldType.Text:
        if not isinstance(value, str):
            return err("string")
    elif field_type == FieldType.ArrayText:
        if not isinstance(value, list) or                 not all(isinstance(v, str) for v in value):
            return err("list of strings")
    elif field_type in (FieldType.ArrayInt, FieldType.ArrayLong):
        if not isinstance(value, list) or                 not all(isinstance(v, int) and not isinstance(v, bool)
                        for v in value):
            return err("list of integers")
    elif field_type in (FieldType.MapInt, FieldType.MapLong,
                        FieldType.MapFloat, FieldType.MapDouble):
        if not isinstance(value, dict) or                 not all(isinstance(k, str) and isinstance(v, (int, float))
                        and not isinstance(v, bool)
                        for k, v in value.items()):
            return err("numeric map")
    return None


class Document:
    def __init__(self, config):
        self.config = config

    def add_documents(self, params, field_count_config=None) -> dict:
        """Core-layer add-documents entry (reference core/document/
        document.py Document.add_documents — takes an optional
        SemiStructuredFieldCountConfig for dynamic-field caps)."""
        from marqo_tpu.core.add_documents import AddDocumentsHandler
        index = self.config.index_meta_cache.get_index(
            params.index_name, force_refresh=True)
        handler = AddDocumentsHandler(
            index=index, engine=self.config.engine, params=params,
            index_management=self.config.index_management,
            meta_cache=self.config.index_meta_cache,
            field_count_config=field_count_config)
        return handler.add_documents()

    @staticmethod
    def remove_duplicated_documents(docs: List[dict]) -> Tuple[List[dict], set]:
        """Last occurrence of each _id wins (reference document.py:173-200)."""
        docs_map: Dict[str, dict] = {}
        ordered: List[dict] = []
        for doc in reversed(docs):
            doc_id = doc.get(constants.MARQO_DOC_ID) if isinstance(doc, dict) \
                else None
            if doc_id is not None:
                if doc_id in docs_map:
                    continue
                docs_map[doc_id] = doc
            ordered.append(doc)
        ordered.reverse()
        return ordered, set(docs_map)

    def partial_update_documents_by_index_name(self, index_name: str,
                                               partial_documents: List[dict]
                                               ) -> dict:
        index = self.config.index_meta_cache.get_index(index_name)
        if not isinstance(index, StructuredMarqoIndex) or \
                isinstance(index, SemiStructuredMarqoIndex):
            raise UnsupportedFeatureError(
                "Partial document update is not supported for unstructured "
                "indexes. Please use add_documents with use_existing_tensor=True "
                "instead")
        # batch bounds (reference api/models/update_documents.py:14-27:
        # empty and over-MARQO_MAX_DOCUMENTS_BATCH_SIZE requests are a 400)
        from marqo_tpu.api import configs
        from marqo_tpu.api.exceptions import BadRequestError
        if not partial_documents:
            raise BadRequestError("Received empty update_documents request")
        max_doc = configs.read_env_vars_and_defaults_ints(
            "MARQO_MAX_DOCUMENTS_BATCH_SIZE") or 128
        if len(partial_documents) > max_doc:
            raise BadRequestError(
                f"Number of docs in update_documents request "
                f"({len(partial_documents)}) exceeds limit of {max_doc}. "
                f"If using the Python client, break up your "
                f"update_documents request into smaller batches using its "
                f"client_batch_size parameter ")
        start = time.perf_counter()
        docs, _ = self.remove_duplicated_documents(partial_documents)
        items = []
        errors = False
        tensor_names = {tf.name for tf in index.tensor_fields}
        # fields referenced by a multimodal combination cannot be updated
        # (reference structured_vespa_index.py:88-91)
        dependent_names = set()
        for f in index.fields:
            if getattr(f, "dependent_fields", None):
                dependent_names.update(f.dependent_fields.keys())
        field_map = index.field_map
        for doc in docs:
            doc_id = doc.get(constants.MARQO_DOC_ID)
            if not isinstance(doc_id, str) or not doc_id:
                errors = True
                items.append({"_id": str(doc_id or ""), "status": 400,
                              "error": "'_id' is a required field but it "
                                       "does not exist, or is not a string"})
                continue
            if self.config.engine.get(index.schema_name, doc_id) is None:
                errors = True
                items.append({"_id": doc_id, "status": 404,
                              "error": "Document does not exist in the index"})
                continue
            bad = None
            updates = {}
            for field, value in doc.items():
                if field == constants.MARQO_DOC_ID:
                    continue
                if field in tensor_names:
                    bad = (f"Field `{field}` cannot be updated as this is a "
                           f"tensor field. Tensor fields cannot be partially "
                           f"updated; use add_documents")
                    break
                if field in dependent_names:
                    bad = (f"You cannot modify '{field}' field as this is a "
                           f"dependent field of a multimodal combination "
                           f"field")
                    break
                declared = field_map.get(field)
                if declared is None:
                    bad = (f"Invalid field name `{field}`: not defined in "
                           f"the index schema")
                    break
                if declared.type not in _UPDATABLE_TYPES:
                    bad = (f"Field `{field}` of type {declared.type.value} "
                           f"does not support partial updates")
                    break
                bad = _validate_update_value(field, declared.type, value)
                if bad:
                    break
                updates[field] = value
            if bad:
                errors = True
                items.append({"_id": doc_id, "status": 400, "error": bad})
                continue
            # atomic merge under the engine's shard lock — a get/merge/
            # feed read-modify-write here would lose a concurrent
            # add_documents or partial update between the read and the
            # write (Vespa partial updates are atomic per document), and
            # would needlessly round-trip every tensor
            if self.config.engine.update(index.schema_name, doc_id, updates):
                items.append({"_id": doc_id, "status": 200})
            else:
                # deleted between the existence check and the update
                errors = True
                items.append({"_id": doc_id, "status": 404,
                              "error": "Document does not exist in the index"})
        return {
            "errors": errors,
            "index_name": index_name,
            "items": items,
            "processingTimeMs": (time.perf_counter() - start) * 1000,
        }

    def delete_all_docs_by_index_name(self, index_name: str) -> int:
        index = self.config.index_meta_cache.get_index(index_name)
        return self.config.engine.delete_all(index.schema_name)
