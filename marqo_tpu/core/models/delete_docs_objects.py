"""Delete-documents request/response value objects.

Parity: reference tensor_search/models/delete_docs_objects.py:10-25 — the
interface objects for the delete-documents endpoint, consumed by
tensor_search.validation.validate_delete_docs_request.
"""

import datetime
from typing import List, Literal, NamedTuple


class MqDeleteDocsResponse(NamedTuple):
    """Data sent back to users after a delete (reference :10-18)."""
    index_name: str
    status_string: Literal["succeeded"]
    document_ids: List[str]
    deleted_documents_count: int
    result_list: List[dict]
    deletion_start: datetime.datetime
    deletion_end: datetime.datetime


class MqDeleteDocsRequest(NamedTuple):
    """Data from users for a delete request (reference :21-25)."""
    index_name: str
    schema_name: str
    document_ids: List[str]
