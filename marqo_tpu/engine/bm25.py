"""Per-field BM25 inverted index.

Role parity: Vespa's bm25 posting lists + weakAnd retrieval (the
reference enables ``indexing: index | bm25`` on lexical fields,
structured_vespa_schema.py:84-101, and ranks with per-field bm25
aggregation, :245-308). Python reference implementation; the native C++
engine (engine/cpp) implements the same contract for large corpora.

Scoring: classic Okapi BM25 (k1=1.2, b=0.75 — Vespa's defaults).
Query semantics: weakAnd over optional terms (OR), required phrases must
all appear in at least one searched field (reference
utils.parse_lexical_query: "quoted required phrases" vs optional terms).
"""

import math
import re
from collections import defaultdict
from typing import Dict, List, Optional, Set

# underscore is a word character, as in Vespa's tokenization — the
# reference pins that "field_1_document_1" matches ONLY the doc containing
# that exact compound (test_search_combined.py test_LexicalSearchResultsScore)
_TOKEN_RE = re.compile(r"[a-z0-9_]+")

K1 = 1.2
B = 0.75


def tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(str(text).lower())


def global_idf(num_docs: int, df: int) -> float:
    """Okapi idf from externally-aggregated corpus statistics (same formula
    as the local paths; used for cluster-wide / cross-shard scoring so BM25
    matches a single-node index exactly)."""
    if df <= 0:
        return 0.0
    return math.log(1 + (num_docs - df + 0.5) / (df + 0.5))


def stats_avg_len(stats: Dict) -> float:
    n = stats.get("num_docs", 0)
    return (stats["total_length"] / n) if n else 0.0


class Bm25FieldIndex:
    """Inverted index for one lexical field."""

    def __init__(self):
        # term -> {doc_id: term_frequency}
        self.postings: Dict[str, Dict[str, int]] = defaultdict(dict)
        self.doc_lengths: Dict[str, int] = {}
        self.total_length = 0

    def add(self, doc_id: str, text: str) -> None:
        tokens = tokenize(text)
        if doc_id in self.doc_lengths:
            self.remove(doc_id)
        self.doc_lengths[doc_id] = len(tokens)
        self.total_length += len(tokens)
        for tok in tokens:
            self.postings[tok][doc_id] = self.postings[tok].get(doc_id, 0) + 1

    def remove(self, doc_id: str) -> None:
        length = self.doc_lengths.pop(doc_id, None)
        if length is None:
            return
        self.total_length -= length
        for term_postings in self.postings.values():
            term_postings.pop(doc_id, None)

    @property
    def num_docs(self) -> int:
        return len(self.doc_lengths)

    def avg_length(self) -> float:
        n = self.num_docs
        return (self.total_length / n) if n else 0.0

    def idf(self, term: str) -> float:
        n, df = self.num_docs, len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def stats(self, terms: List[str]) -> Dict:
        """Corpus statistics for cross-shard aggregation: live doc count,
        total token length, per-term document frequency."""
        return {"num_docs": self.num_docs,
                "total_length": self.total_length,
                "df": {t: len(self.postings.get(t, ())) for t in terms}}

    def score_terms(self, terms: List[str],
                    allowed: Optional[Set[str]] = None,
                    global_stats: Optional[Dict] = None) -> Dict[str, float]:
        """BM25 scores for docs matching any term (weakAnd). When
        `global_stats` ({"num_docs", "total_length", "df"}) is given, idf
        and avgdl come from those aggregated statistics instead of this
        shard's local corpus."""
        scores: Dict[str, float] = defaultdict(float)
        if global_stats is not None:
            avg_len = stats_avg_len(global_stats) or 1.0
        else:
            avg_len = self.avg_length() or 1.0
        for term in terms:
            postings = self.postings.get(term)
            if not postings:
                continue
            if global_stats is not None:
                idf = global_idf(global_stats["num_docs"],
                                 int(global_stats["df"].get(term, 0)))
            else:
                idf = self.idf(term)
            if idf <= 0.0:
                continue
            for doc_id, tf in postings.items():
                if allowed is not None and doc_id not in allowed:
                    continue
                dl = self.doc_lengths.get(doc_id, 0)
                denom = tf + K1 * (1 - B + B * dl / avg_len)
                scores[doc_id] += idf * (tf * (K1 + 1)) / denom
        return scores

    def docs_with_phrase(self, phrase: str) -> Set[str]:
        """Docs containing all tokens of the phrase (conjunctive term match;
        positional adjacency is enforced by the native engine)."""
        tokens = tokenize(phrase)
        if not tokens:
            # a phrase that tokenizes to nothing (e.g. quoted "*" or pure
            # punctuation) can never match — reference treats quoted
            # wildcards as literals (test_search_combined.py:778 expects 0)
            return set()
        result: Optional[Set[str]] = None
        for tok in tokens:
            docs = set(self.postings.get(tok, ()))
            result = docs if result is None else (result & docs)
            if not result:
                return set()
        return result or set()


class NativeBm25FieldIndex:
    """C++ BM25 field index (engine/cpp/bm25.cpp) behind the same
    interface as Bm25FieldIndex, with true positional phrase matching.
    Doc ids are strings at this layer; int handles internally."""

    def __init__(self):
        from marqo_tpu.engine.native import NativeBm25
        self._native = NativeBm25()
        self._handle_by_doc: Dict[str, int] = {}
        self._doc_by_handle: Dict[int, str] = {}
        self._next_handle = 0

    def add(self, doc_id: str, text: str) -> None:
        handle = self._handle_by_doc.get(doc_id)
        if handle is None:
            handle = self._next_handle
            self._next_handle += 1
            self._handle_by_doc[doc_id] = handle
            self._doc_by_handle[handle] = doc_id
        self._native.add_raw(handle, text)

    def remove(self, doc_id: str) -> None:
        handle = self._handle_by_doc.pop(doc_id, None)
        if handle is not None:
            self._doc_by_handle.pop(handle, None)
            self._native.remove(handle)

    @property
    def num_docs(self) -> int:
        return len(self._native)

    def idf(self, term: str) -> float:
        return self._native.idf(term)

    def stats(self, terms: List[str]) -> Dict:
        num_docs, total_length, dfs = self._native.stats(" ".join(terms))
        return {"num_docs": num_docs, "total_length": total_length,
                "df": {t: int(d) for t, d in zip(terms, dfs)}}

    def score_terms(self, terms: List[str],
                    allowed: Optional[Set[str]] = None,
                    global_stats: Optional[Dict] = None) -> Dict[str, float]:
        import numpy as np
        mask = None
        if allowed is not None:
            mask = np.zeros(max(self._next_handle, 1), dtype=np.uint8)
            for doc_id in allowed:
                handle = self._handle_by_doc.get(doc_id)
                if handle is not None:
                    mask[handle] = 1
        idfs, avgdl = None, None
        if global_stats is not None:
            idfs = np.asarray(
                [global_idf(global_stats["num_docs"],
                            int(global_stats["df"].get(t, 0)))
                 for t in terms], dtype=np.float32)
            avgdl = stats_avg_len(global_stats)
        docs, scores = self._native.score(" ".join(terms), mask,
                                          idfs=idfs, avgdl=avgdl)
        return {self._doc_by_handle[int(h)]: float(s)
                for h, s in zip(docs, scores) if int(h) in self._doc_by_handle}

    def docs_with_phrase(self, phrase: str) -> Set[str]:
        tokens = tokenize(phrase)
        if not tokens:
            return set()  # see Bm25FieldIndex.docs_with_phrase
        handles = self._native.phrase_docs(" ".join(tokens))
        return {self._doc_by_handle[int(h)] for h in handles
                if int(h) in self._doc_by_handle}


def make_field_index():
    """Factory: native BM25 when the C++ engine is built, else Python."""
    try:
        from marqo_tpu.engine.native import native_available
        if native_available():
            return NativeBm25FieldIndex()
    except Exception:
        pass
    return Bm25FieldIndex()
