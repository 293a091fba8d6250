"""Orchestration utilities (parity: reference src/marqo/tensor_search/utils.py)."""

import re
from typing import List, Tuple


def parse_lexical_query(text: str) -> Tuple[List[str], List[str]]:
    """Split a lexical query into (required_phrases, optional_terms).

    Parity: reference utils.parse_lexical_query (utils.py:198) — double-
    quoted phrases are required (AND), everything else is optional (OR).

    Returns (and_phrases, or_terms).
    """
    if not isinstance(text, str):
        raise TypeError("lexical query must be a string")
    required: List[str] = []
    remainder = []
    pos = 0
    for match in re.finditer(r'"([^"]*)"', text):
        remainder.append(text[pos:match.start()])
        phrase = match.group(1)
        if phrase.strip():
            required.append(phrase)
        pos = match.end()
    remainder.append(text[pos:])
    optional = [t for t in "".join(remainder).split() if t]
    return required, optional


def read_device(device) -> str:
    """Normalize a request device string; accepts reference-style cuda ids."""
    from marqo_tpu.inference.types import Device
    return Device.normalize(device).value


def validate_doc_id(doc_id) -> None:
    """Shared _id validation (reference validation.validate_id): raises the
    API-level 400 for non-string or empty ids. Used by the document get
    paths; the add-documents handler wraps the same condition into its
    per-doc error envelope."""
    from marqo_tpu.api import exceptions as api_exceptions
    if not isinstance(doc_id, str):
        raise api_exceptions.InvalidDocumentIdError(
            f"Document _id must be a string type! Received _id {doc_id} "
            f"of type `{type(doc_id).__name__}`")
    if not doc_id:
        raise api_exceptions.InvalidDocumentIdError(
            "Document _id can't be empty")
