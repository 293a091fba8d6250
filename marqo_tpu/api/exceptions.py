"""API-level errors carrying HTTP status codes.

Parity: reference src/marqo/api/exceptions.py (status codes, ``code`` strings
and the ``message/code/type/link`` error envelope, api.py:152-157).
"""

from http import HTTPStatus
from typing import Optional

from marqo_tpu.exceptions import MarqoError


class MarqoWebError(MarqoError):
    status_code: int = int(HTTPStatus.INTERNAL_SERVER_ERROR)
    error_type: str = "backend_error"
    code: str = "unhandled_error_type"
    link: str = ""

    def __init__(self, message: Optional[str] = None,
                 status_code: Optional[int] = None,
                 error_type: Optional[str] = None,
                 code: Optional[str] = None,
                 link: Optional[str] = None,
                 cause: Optional[Exception] = None):
        super().__init__(message, cause)
        if status_code is not None:
            self.status_code = status_code
        if error_type is not None:
            self.error_type = error_type
        if code is not None:
            self.code = code
        if link is not None:
            self.link = link

    def to_body(self) -> dict:
        """The error envelope returned over HTTP (reference api.py:152-157)."""
        return {
            "message": self.message,
            "code": self.code,
            "type": self.error_type,
            "link": self.link,
        }


# --- 4xx ---------------------------------------------------------------

class __InvalidRequestError(MarqoWebError):
    error_type = "invalid_request"


class TooManyRequestsError(__InvalidRequestError):
    code = "too_many_requests"
    status_code = int(HTTPStatus.TOO_MANY_REQUESTS)


class VectorStoreTimeoutError(__InvalidRequestError):
    """Reference api/exceptions.py:118-120 — engine/vector-store timeouts
    are a 504 with type invalid_request (not an internal error)."""
    code = "vector_store_timeout"
    status_code = int(HTTPStatus.GATEWAY_TIMEOUT)


class DisabledFeatureError(__InvalidRequestError):
    """Gated debug/ops endpoints return 403 when the enabling env var is
    unset (reference utils.enable_debug_apis/enable_ops_api raise
    HTTPException(403), utils.py:414-434)."""
    code = "feature_disabled"
    status_code = int(HTTPStatus.FORBIDDEN)


class IndexAlreadyExistsError(__InvalidRequestError):
    code = "index_already_exists"
    status_code = int(HTTPStatus.CONFLICT)


class IndexNotFoundError(__InvalidRequestError):
    code = "index_not_found"
    status_code = int(HTTPStatus.NOT_FOUND)


class InvalidIndexNameError(__InvalidRequestError):
    code = "invalid_index_name"
    status_code = int(HTTPStatus.BAD_REQUEST)


class InvalidDocumentIdError(__InvalidRequestError):
    code = "invalid_document_id"
    status_code = int(HTTPStatus.BAD_REQUEST)


class DocumentNotFoundError(__InvalidRequestError):
    code = "document_not_found"
    status_code = int(HTTPStatus.NOT_FOUND)


class NonTensorIndexError(__InvalidRequestError):
    code = "index_not_tensor"
    status_code = int(HTTPStatus.BAD_REQUEST)


class InvalidArgError(__InvalidRequestError):
    code = "invalid_argument"
    status_code = int(HTTPStatus.BAD_REQUEST)


class ValidationError(__InvalidRequestError):
    code = "validation_error"
    status_code = int(HTTPStatus.UNPROCESSABLE_ENTITY)


class BadRequestError(__InvalidRequestError):
    code = "bad_request"
    status_code = int(HTTPStatus.BAD_REQUEST)


class IllegalRequestedDocCount(__InvalidRequestError):
    code = "illegal_requested_doc_count"
    status_code = int(HTTPStatus.BAD_REQUEST)


class DocTooLargeError(__InvalidRequestError):
    """Reference api/exceptions.py:163-165."""
    code = "doc_too_large"
    status_code = int(HTTPStatus.BAD_REQUEST)


class InvalidFieldNameError(__InvalidRequestError):
    code = "invalid_field_name"
    status_code = int(HTTPStatus.BAD_REQUEST)


class ModelNotInCacheError(__InvalidRequestError):
    code = "model_not_in_cache"
    status_code = int(HTTPStatus.NOT_FOUND)


class ModelCacheManagementError(__InvalidRequestError):
    """Model-cache contention / capacity failure (reference
    api/exceptions.py:128-130: code model_cache_management_error, 409)."""
    code = "model_cache_management_error"
    status_code = int(HTTPStatus.CONFLICT)


class UnsupportedOperationError(__InvalidRequestError):
    code = "unsupported_operation"
    status_code = int(HTTPStatus.BAD_REQUEST)


class InvalidModelPropertiesError(__InvalidRequestError):
    code = "invalid_model_properties"
    status_code = int(HTTPStatus.BAD_REQUEST)


class OperationConflictError(__InvalidRequestError):
    code = "operation_conflict"
    status_code = int(HTTPStatus.CONFLICT)


# --- 5xx ---------------------------------------------------------------

class InternalError(MarqoWebError):
    error_type = "internal_error"
    code = "internal"
    status_code = int(HTTPStatus.INTERNAL_SERVER_ERROR)


class StartupSanitationError(InternalError):
    """Invalid deployment configuration detected at startup."""
    code = "startup_sanitation_error"


class BackendDataParsingError(InternalError):
    """Reference api/exceptions.py:228 — engine payloads that fail to
    parse are a 500 distinct from generic internal errors."""
    code = "backend_data_parsing_error"
    status_code = int(HTTPStatus.INTERNAL_SERVER_ERROR)


class BackendCommunicationError(InternalError):
    code = "backend_communication_error"
    status_code = int(HTTPStatus.INTERNAL_SERVER_ERROR)


class BackendTimeoutError(InternalError):
    code = "backend_timeout"
    status_code = int(HTTPStatus.GATEWAY_TIMEOUT)


class ModelLoadError(InternalError):
    code = "model_load_error"


class VectoriseError(InternalError):
    code = "vectorise_error"


class ServiceUnavailableError(MarqoWebError):
    error_type = "service_unavailable"
    code = "service_unavailable"
    status_code = int(HTTPStatus.SERVICE_UNAVAILABLE)


class EnvVarError(MarqoWebError):
    """Malformed environment-variable configuration (reference
    api/exceptions.py:24-28)."""
    error_type = "invalid_request"
    code = "env_var_error"
    status_code = int(HTTPStatus.INTERNAL_SERVER_ERROR)
