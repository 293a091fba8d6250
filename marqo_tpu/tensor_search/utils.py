"""Orchestration utilities (parity: reference src/marqo/tensor_search/utils.py)."""

import re
from typing import List, Tuple


def parse_lexical_query(text: str) -> Tuple[List[str], List[str]]:
    """Split a lexical query into (required_phrases, optional_terms).

    Parity: reference utils.parse_lexical_query (utils.py:198-276) —
    double-quoted phrases are required (AND), everything else is optional
    (OR). Quote syntax rules: a quote pair only counts when the opening
    quote is at the start or after a space AND the closing quote is at the
    end or before a space; a pair with bad syntax on either side turns
    BOTH quotes into whitespace (splitting the enclosed text into optional
    terms); an unpaired quote becomes whitespace; ``\\"`` is a literal
    character, not a quote.

    Returns (and_phrases, or_terms).
    """
    if not isinstance(text, str):
        raise TypeError("parse_lexical_query must have string as input")
    required: List[str] = []
    # blob mirrors the text with resolved quotes removed/whitespaced;
    # optional terms come from splitting it at the end
    blob: List[str] = []
    open_text_idx = None   # opening-quote position in text
    open_blob_idx = None   # opening-quote position in blob
    pair_faulty = False
    for i, ch in enumerate(text):
        blob.append(ch)
        if ch != '"' or (i > 0 and text[i - 1] == "\\"):
            continue  # escaped quotes are literal
        if open_text_idx is None:
            open_text_idx, open_blob_idx = i, len(blob) - 1
            if not (i == 0 or text[i - 1] == " "):
                pair_faulty = True
                blob[-1] = " "
        else:
            closes_cleanly = (i == len(text) - 1 or text[i + 1] == " ")
            if closes_cleanly and not pair_faulty:
                phrase = text[open_text_idx + 1:i]
                if phrase:
                    required.append(phrase)
                del blob[-(len(phrase) + 2):]
            else:
                blob[open_blob_idx] = " "
                blob[-1] = " "
            open_text_idx = open_blob_idx = None
            pair_faulty = False
    if open_blob_idx is not None:
        blob[open_blob_idx] = " "
    optional = "".join(blob).split()
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
