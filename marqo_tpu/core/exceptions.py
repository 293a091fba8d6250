"""Core (domain) errors.

Parity: reference src/marqo/core/exceptions.py. These are raised by the
domain layer and translated to HTTP errors by the API layer's ordered
mapping (reference src/marqo/tensor_search/api.py:88-141).
"""

from marqo_tpu.exceptions import MarqoError, InvalidArgumentError


class IndexExistsError(MarqoError):
    pass


class IndexNotFoundError(MarqoError):
    pass


class OperationConflictError(MarqoError):
    pass


class BackendCommunicationError(MarqoError):
    pass


class BackendTimeoutError(MarqoError):
    pass


class EngineOutOfSpaceError(MarqoError):
    """Feed refused: host memory/disk above the feed-block watermark
    (role of Vespa refusing feeds over its resource limits; the engine
    server surfaces this as HTTP 507 and the per-document translate
    matrix maps it to 400 'out of memory or disk space',
    vespa_client.py:579-607)."""
    pass


class ZeroMagnitudeVectorError(InvalidArgumentError):
    pass


class InvalidFieldNameError(InvalidArgumentError):
    pass


class InvalidDataTypeError(InvalidArgumentError):
    pass


class InvalidDataRangeError(InvalidArgumentError):
    pass


class FilterStringParsingError(InvalidArgumentError):
    pass


class UnsupportedFeatureError(InvalidArgumentError):
    pass


class ParsingError(MarqoError):
    pass


class VespaDocumentParsingError(ParsingError):
    """Kept name-compatible with the reference for error-envelope parity."""
    pass


class MarqoDocumentParsingError(ParsingError, InvalidArgumentError):
    pass


class InvalidTensorFieldError(MarqoDocumentParsingError):
    pass


class DuplicateDocumentError(MarqoDocumentParsingError):
    pass


class TooManyFieldsError(MarqoError):
    pass


class DeviceError(MarqoError):
    pass


class ModelError(MarqoError):
    pass


class RerankerError(ModelError):
    """Reference s2_inference/errors.py RerankerError — reranking
    failures surface as 400s at the search layer."""


class RerankerNameError(RerankerError):
    """Reference RerankerNameError — unknown reranker model name."""


class ModelNotInCacheError(ModelError):
    pass


class ModelLoadError(ModelError):
    pass


class ModelDownloadError(ModelError):
    pass


class VectoriseError(ModelError):
    """Raised when encoding content fails (reference s2_inference errors)."""
    pass


class ApplicationNotInitializedError(MarqoError):
    """Raised when the settings store was not bootstrapped yet."""
    pass


class ApplicationRollbackError(MarqoError):
    pass


class InternalError(MarqoError):
    pass
