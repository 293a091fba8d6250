"""StoreEngine ↔ native HNSW integration: approximate path engages above
the corpus threshold and agrees with exact scoring."""

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.native import native_available
from marqo_tpu.engine.store import StoreEngine

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine not built")

N_DOCS = 1500
DIM = 16


@pytest.fixture(scope="module")
def big_engine():
    rng = np.random.default_rng(0)
    eng = StoreEngine(n_shards=1)
    eng.create_index(IndexDescriptor(
        name="big", model_dimensions=DIM,
        tensor_fields=[TensorFieldDescriptor(name="vec", dimensions=DIM,
                                             hnsw_m=16,
                                             hnsw_ef_construction=128)]))
    vectors = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    for i in range(N_DOCS):
        eng.feed("big", f"d{i}", {"n": i},
                 {"vec": {"chunks": [f"c{i}"], "embeddings": [vectors[i]]}})
    return eng, vectors


class TestApproximatePath:
    def test_approximate_matches_exact_top1(self, big_engine):
        eng, vectors = big_engine
        for qi in (3, 777, 1200):
            approx = eng.query_tensor("big", vectors[qi], limit=5,
                                      approximate=True)
            exact = eng.query_tensor("big", vectors[qi], limit=5,
                                     approximate=False)
            assert approx.hits[0].doc_id == exact.hits[0].doc_id == f"d{qi}"

    def test_recall_at_10(self, big_engine):
        eng, vectors = big_engine
        rng = np.random.default_rng(9)
        q = rng.standard_normal(DIM).astype(np.float32)
        q /= np.linalg.norm(q)
        exact = [h.doc_id for h in
                 eng.query_tensor("big", q, limit=10, approximate=False).hits]
        approx = [h.doc_id for h in
                  eng.query_tensor("big", q, limit=10, approximate=True).hits]
        overlap = len(set(exact) & set(approx)) / 10
        assert overlap >= 0.9, (exact, approx)

    def test_filtered_approximate(self, big_engine):
        eng, vectors = big_engine
        from marqo_tpu.core.search.search_filter import MarqoFilterStringParser
        f = MarqoFilterStringParser().parse("n:[0 TO 99]")
        res = eng.query_tensor("big", vectors[50], limit=5, approximate=True,
                               search_filter=f)
        assert res.hits[0].doc_id == "d50"
        assert all(int(h.doc_id[1:]) < 100 for h in res.hits)

    def test_delete_then_search(self, big_engine):
        eng, vectors = big_engine
        assert eng.delete("big", "d3")
        res = eng.query_tensor("big", vectors[3], limit=3, approximate=True)
        assert "d3" not in [h.doc_id for h in res.hits]
        # restore for other tests
        eng.feed("big", "d3", {"n": 3},
                 {"vec": {"chunks": ["c3"], "embeddings": [vectors[3]]}})


class TestDeviceExactScorer:
    def test_scorer_below_threshold_returns_none(self):
        from marqo_tpu.engine.jax_scorer import JaxExactScorer
        scorer = JaxExactScorer()
        matrix = np.random.default_rng(0).standard_normal(
            (100, 8)).astype(np.float32)
        out = scorer.top_k(matrix, 0, matrix[0], k=5,
                           valid_mask=np.ones(100, bool))
        assert out is None  # corpus too small / no accelerator in tests

    def test_scorer_logic_with_forced_threshold(self, monkeypatch):
        """Exercise the jit scoring path on CPU by lowering the gates."""
        import marqo_tpu.engine.jax_scorer as js
        monkeypatch.setattr(js, "MIN_ROWS_FOR_DEVICE", 10)
        monkeypatch.setattr(js, "device_available", lambda: True)
        rng = np.random.default_rng(1)
        matrix = rng.standard_normal((64, 8)).astype(np.float32)
        matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
        valid = np.ones(64, bool)
        valid[7] = False
        scorer = js.JaxExactScorer("prenormalized-angular")
        rows, scores = scorer.top_k(matrix, 0, matrix[7], k=3, valid_mask=valid)
        assert 7 not in rows  # invalid row excluded
        # agrees with numpy ranking over valid rows (bf16 tolerance)
        sims = matrix @ matrix[7]
        sims[~valid] = -np.inf
        assert rows[0] == int(np.argmax(sims))
