"""Text chunking: split documents into embeddable chunks.

Parity: reference src/marqo/s2_inference/processing/text.py:11-50 —
character/word/sentence/passage splitters with windowed merge
(``split_length`` units per chunk, ``split_overlap`` overlap). The sentence
splitter is a self-contained regex splitter (the reference downloads NLTK
punkt; we avoid the runtime download with equivalent behavior for standard
prose). The per-chunk prefix is prepended at vectorise time, not stored
(reference TextChunker.chunk, tensor_fields_container.py:66-73).
"""

import re
from typing import List

from marqo_tpu.core.models.marqo_index import TextPreProcessing, TextSplitMethod

# sentence boundary: terminator(s) + closing quotes/brackets + whitespace,
# not preceded by a common abbreviation or a single initial
_ABBREVIATIONS = {
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "no", "vs", "etc",
    "e.g", "i.e", "inc", "ltd", "co", "corp", "fig", "al", "vol", "pp",
}
_SENT_RE = re.compile(r'(?<=[.!?])["\')\]]*\s+')


def split_sentences(text: str) -> List[str]:
    pieces = _SENT_RE.split(text)
    # re-merge splits that follow abbreviations or single initials
    out: List[str] = []
    for piece in pieces:
        if out:
            prev = out[-1].rstrip()
            last_word = prev.rstrip(".").split()[-1].lower() if prev.split() else ""
            if (last_word in _ABBREVIATIONS or
                    (len(last_word) == 1 and last_word.isalpha())):
                out[-1] = out[-1] + " " + piece
                continue
        out.append(piece)
    return [s for s in (p.strip() for p in out) if s]


def split_paragraphs(text: str) -> List[str]:
    return [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]


def _windowed(units: List[str], length: int, overlap: int,
              joiner: str) -> List[str]:
    """Merge split units into chunks of ``length`` with ``overlap``
    (reference uses more_itertools.windowed with the same semantics)."""
    if not units:
        return []
    if length <= 0:
        length = 1
    step = max(1, length - overlap)
    chunks = []
    for start in range(0, len(units), step):
        window = units[start:start + length]
        if not window:
            break
        chunks.append(joiner.join(window))
        if start + length >= len(units):
            break
    return chunks


def chunk_text(text: str, config: TextPreProcessing) -> List[str]:
    """Split ``text`` per index settings; always returns ≥1 chunk.

    Empty/whitespace text becomes the single chunk " " — the reference
    coerces invalid/empty strings to " " and returns it unsplit
    (processing/text.py:133-137 check_make_string_valid + len<=1 branch;
    tests/processing/test_split_text.py:28 asserts [' ']), so a doc with
    an empty tensor field still stores one vector."""
    if not text or not text.strip():
        return [" "]
    method = config.split_method
    length, overlap = config.split_length, config.split_overlap
    if method == TextSplitMethod.Character:
        units = list(text)
        return _windowed(units, length, overlap, "")
    if method == TextSplitMethod.Word:
        units = text.split()
        return _windowed(units, length, overlap, " ")
    if method == TextSplitMethod.Sentence:
        units = split_sentences(text)
        return _windowed(units, length, overlap, " ")
    if method == TextSplitMethod.Passage:
        units = split_paragraphs(text)
        return _windowed(units, length, overlap, "\n\n")
    raise ValueError(f"Unknown split method: {method}")
