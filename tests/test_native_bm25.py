"""Native C++ BM25: score parity with the Python index, positional phrases,
deletes, filters."""

import numpy as np
import pytest

from marqo_tpu.engine.bm25 import Bm25FieldIndex, NativeBm25FieldIndex
from marqo_tpu.engine.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine not built")

DOCS = {
    "d1": "the quick brown fox jumps over the lazy dog",
    "d2": "a quick brown cat sleeps all day",
    "d3": "dogs and cats living together",
    "d4": "the fox is quick and the dog is lazy",
}


def _both():
    py, native = Bm25FieldIndex(), NativeBm25FieldIndex()
    for doc_id, text in DOCS.items():
        py.add(doc_id, text)
        native.add(doc_id, text)
    return py, native


class TestNativeBm25:
    def test_score_parity_with_python(self):
        py, native = _both()
        for terms in (["quick"], ["quick", "fox"], ["lazy", "dog", "cat"]):
            py_scores = py.score_terms(terms)
            native_scores = native.score_terms(terms)
            assert set(py_scores) == set(native_scores)
            for doc_id in py_scores:
                assert abs(py_scores[doc_id] - native_scores[doc_id]) < 1e-4, \
                    (terms, doc_id)

    def test_allowed_filter(self):
        _, native = _both()
        scores = native.score_terms(["quick"], allowed={"d2", "d4"})
        assert set(scores) == {"d2", "d4"}

    def test_positional_phrase(self):
        _, native = _both()
        # "quick brown" is adjacent in d1 and d2
        assert native.docs_with_phrase("quick brown") == {"d1", "d2"}
        # "brown dog" tokens co-occur in d1 but are NOT adjacent
        assert native.docs_with_phrase("brown dog") == set()
        assert native.docs_with_phrase("missing phrase") == set()

    def test_remove_and_replace(self):
        _, native = _both()
        native.remove("d1")
        assert native.num_docs == 3
        assert "d1" not in native.score_terms(["quick"])
        native.add("d1", "completely new text")
        scores = native.score_terms(["completely"])
        assert set(scores) == {"d1"}

    def test_idf_parity(self):
        py, native = _both()
        for term in ("quick", "fox", "nonexistent"):
            assert abs(py.idf(term) - native.idf(term)) < 1e-5

    def test_tombstone_compaction(self):
        native = NativeBm25FieldIndex()
        for i in range(3000):
            native.add(f"doc{i}", f"token{i % 50} shared word")
        for i in range(0, 3000, 2):
            native.remove(f"doc{i}")
        assert native.num_docs == 1500
        scores = native.score_terms(["shared"])
        assert len(scores) == 1500
