"""Ported reference tests: text splitting goldens.

Source: /root/reference/tests/processing/test_split_text.py — empty/
whitespace/None inputs all become the single chunk [' ']; single
characters survive every split method; character-split windows with
overlap produce exact goldens ('short' → ['shor','rt'] at 4/1, etc.);
word/sentence splits of a single word return it unchanged; chunk
prefixes are prepended verbatim (empty/None prefix = no-op, reference
prefix_text_chunks).
"""

import pytest

from marqo_tpu.core.models.marqo_index import (TextPreProcessing,
                                               TextSplitMethod)
from marqo_tpu.inference.text_chunker import chunk_text

METHODS = [TextSplitMethod.Character, TextSplitMethod.Word,
           TextSplitMethod.Sentence]


def _cfg(method, length=2, overlap=0):
    return TextPreProcessing(split_method=method, split_length=length,
                             split_overlap=overlap)


class TestSplitText:
    @pytest.mark.parametrize("method", METHODS)
    @pytest.mark.parametrize("text", ["", None, " ", "\r", "   ", "\r\t",
                                      "\r  \t"])
    def test_empty_and_whitespace_become_single_space(self, method, text):
        assert chunk_text(text or "", _cfg(method)) == [" "]

    @pytest.mark.parametrize("method", METHODS)
    def test_single_character(self, method):
        assert chunk_text("a", _cfg(method)) == ["a"]

    @pytest.mark.parametrize("length,overlap,expected", [
        (4, 1, ["shor", "rt"]),
        (4, 2, ["shor", "ort"]),
        (4, 3, ["shor", "hort"]),
        (1, 0, list("short")),
    ])
    def test_character_split_goldens(self, length, overlap, expected):
        got = chunk_text("short", _cfg(TextSplitMethod.Character,
                                       length, overlap))
        assert got == expected

    @pytest.mark.parametrize("method", [TextSplitMethod.Word,
                                        TextSplitMethod.Sentence])
    def test_single_word_unsplit_by_word_and_sentence(self, method):
        assert chunk_text("short", _cfg(method, 4, 1)) == ["short"]

    def test_word_split_windows(self):
        text = "one two three four five"
        got = chunk_text(text, _cfg(TextSplitMethod.Word, 2, 0))
        assert got == ["one two", "three four", "five"]
        got = chunk_text(text, _cfg(TextSplitMethod.Word, 2, 1))
        assert got == ["one two", "two three", "three four", "four five"]

    def test_sentence_split(self):
        text = "First sentence. Second sentence! Third one?"
        got = chunk_text(text, _cfg(TextSplitMethod.Sentence, 1, 0))
        assert got == ["First sentence.", "Second sentence!", "Third one?"]
        got = chunk_text(text, _cfg(TextSplitMethod.Sentence, 2, 0))
        assert got == ["First sentence. Second sentence!", "Third one?"]


class TestPrefixChunks:
    """The prefix is prepended at vectorise time (reference
    prefix_text_chunks; our add_documents chunk_prefix + chunk)."""

    @pytest.mark.parametrize("prefix,expected", [
        ("prefix_", ["prefix_a", "prefix_b", "prefix_c", "prefix_"]),
        ("", ["a", "b", "c", ""]),
        (None, ["a", "b", "c", ""]),
    ])
    def test_prefix_text_chunks(self, prefix, expected):
        chunks = ["a", "b", "c", ""]
        got = [(prefix or "") + c for c in chunks]
        assert got == expected
