"""Central registry of documentation links used in error messages.

Parity: reference src/marqo/marqo_docs.py.
"""

_BASE = "https://docs.marqo.ai/latest"


def _link(path: str) -> str:
    return f"{_BASE}/{path}"


def create_index() -> str:
    return _link("reference/api/indexes/create-index/")


def search() -> str:
    return _link("reference/api/search/search/")


def add_documents() -> str:
    return _link("reference/api/documents/add-or-replace-documents/")


def list_of_models() -> str:
    return _link("models/marqo/list-of-models/")


def search_context() -> str:
    return _link("reference/api/search/search/#context")


def query_reference() -> str:
    return _link("reference/api/search/search/#query-q")


def indexing_images() -> str:
    return _link("other-resources/guides/advanced-usage/images/")


def api_reference_document_body() -> str:
    return _link("reference/api/documents/add-or-replace-documents/#body")


def configuring_marqo() -> str:
    return _link("other-resources/guides/advanced-usage/configuration/")


def troubleshooting() -> str:
    return _link("other-resources/troubleshooting/troubleshooting/")


def generic() -> str:
    return _BASE
