"""Regression tests for the round-5 search/store review fixes.

Reference behaviors targeted:
  - An index's distance metric governs scoring on EVERY path; a metric
    with no native/device kernel (hamming, geodegrees) must fall back to
    exact scoring, never silently score with a different metric.
  - Hybrid cross modes rank the RETRIEVED top-k by the other leg
    (HybridSearcher.java), and the ranking leg's score modifiers apply
    (hybrid_parameters _validate_combinations allows exactly those).
  - Zero-chunk tensor payloads are valid; snapshot survives a concurrent
    index delete; '' env values fall back to defaults.
"""

import numpy as np
import pytest

from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.score_modifier import (ScoreModifier,
                                                  ScoreModifierType)
from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.store import StoreEngine


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return (v / np.linalg.norm(v)).tolist()


def _mk(metric="prenormalized-angular", name="qrf"):
    engine = StoreEngine()
    engine.create_index(IndexDescriptor(
        name=name, model_dimensions=4,
        tensor_fields=[TensorFieldDescriptor(
            name="vec", dimensions=4, distance_metric=metric)]))
    return engine


class TestUnsupportedMetricFallsBackExact:
    def test_hamming_approximate_matches_exact(self):
        """Above the HNSW threshold a hamming index must NOT build a
        prenorm-angular graph — approximate results must equal exact."""
        engine = _mk(metric="hamming", name="ham")
        rng = np.random.default_rng(0)
        for i in range(1100):  # above the 1024 approximate threshold
            vec = (rng.random(4) > 0.5).astype(np.float32)
            engine.feed("ham", f"d{i}", {"n": i},
                        {"vec": {"chunks": [f"c{i}"],
                                 "embeddings": [vec.tolist()]}})
        q = [1.0, 0.0, 1.0, 0.0]
        approx = engine.query_tensor("ham", q, limit=10, approximate=True)
        exact = engine.query_tensor("ham", q, limit=10, approximate=False)
        assert [h.doc_id for h in approx.hits] == \
            [h.doc_id for h in exact.hits]
        np.testing.assert_allclose([h.score for h in approx.hits],
                                   [h.score for h in exact.hits])

    def test_native_rejects_unknown_metric_loudly(self):
        from marqo_tpu.engine.native import NativeHnsw, native_available
        if not native_available():
            pytest.skip("native engine unavailable")
        with pytest.raises(ValueError, match="hamming"):
            NativeHnsw(4, metric="hamming")


class TestHybridCrossModes:
    @pytest.fixture
    def corpus(self):
        engine = _mk(name="hx")
        # d0: best tensor match, weak lexical; d1: weak tensor, best
        # lexical; d2: middling both; popularity drives the modifier
        docs = [
            ("d0", _unit([1, 0, 0, 0]), "apple pie", 2.0),
            ("d1", _unit([0, 1, 0, 0]), "apple apple apple apple", 10.0),
            ("d2", _unit([0.7, 0.7, 0, 0]), "apple tart", 5.0),
        ]
        for doc_id, vec, text, pop in docs:
            engine.feed("hx", doc_id, {"text": text, "popularity": pop},
                        {"vec": {"chunks": [text], "embeddings": [vec]}})
        return engine

    def test_lexical_ranking_modifiers_apply(self, corpus):
        base = corpus.query_hybrid(
            "hx", _unit([1, 0.1, 0, 0]), ["apple"], [], limit=3,
            retrieval_method="tensor", ranking_method="lexical")
        modified = corpus.query_hybrid(
            "hx", _unit([1, 0.1, 0, 0]), ["apple"], [], limit=3,
            retrieval_method="tensor", ranking_method="lexical",
            score_modifiers_lexical=[ScoreModifier(
                field="popularity", type=ScoreModifierType.Multiply,
                weight=1.0)])
        assert {h.doc_id for h in base.hits} == \
            {h.doc_id for h in modified.hits}
        base_scores = {h.doc_id: h.score for h in base.hits}
        mod_scores = {h.doc_id: h.score for h in modified.hits}
        # every score must reflect score * popularity
        for doc_id, score in mod_scores.items():
            pop = {"d0": 2.0, "d1": 10.0, "d2": 5.0}[doc_id]
            np.testing.assert_allclose(score, base_scores[doc_id] * pop,
                                       rtol=1e-5)

    def test_tensor_ranking_modifiers_apply(self, corpus):
        base = corpus.query_hybrid(
            "hx", _unit([1, 0.1, 0, 0]), ["apple"], [], limit=3,
            retrieval_method="lexical", ranking_method="tensor")
        modified = corpus.query_hybrid(
            "hx", _unit([1, 0.1, 0, 0]), ["apple"], [], limit=3,
            retrieval_method="lexical", ranking_method="tensor",
            score_modifiers_tensor=[ScoreModifier(
                field="popularity", type=ScoreModifierType.Multiply,
                weight=1.0)])
        base_scores = {h.doc_id: h.score for h in base.hits}
        for h in modified.hits:
            pop = {"d0": 2.0, "d1": 10.0, "d2": 5.0}[h.doc_id]
            np.testing.assert_allclose(h.score, base_scores[h.doc_id] * pop,
                                       rtol=1e-5)

    def test_tensor_retrieval_truncates_before_lexical_ranking(self):
        """retrieve-by-tensor must bound the candidate set: a doc outside
        the tensor top-k must not win on lexical score (the old exact
        path scored EVERY doc, degrading to a global lexical ranking)."""
        engine = _mk(name="ht")
        rng = np.random.default_rng(1)
        # 20 docs near the query; 1 adversary far from it with the
        # strongest lexical match
        for i in range(20):
            vec = _unit([1.0, rng.random() * 0.1, rng.random() * 0.1, 0])
            engine.feed("ht", f"near{i}", {"text": "apple"},
                        {"vec": {"chunks": ["apple"], "embeddings": [vec]}})
        engine.feed("ht", "adversary", {"text": "apple " * 10},
                    {"vec": {"chunks": ["x"],
                             "embeddings": [_unit([0, 0, 0, 1])]}})
        res = engine.query_hybrid(
            "ht", _unit([1, 0, 0, 0]), ["apple"], [], limit=5,
            retrieval_method="tensor", ranking_method="lexical")
        assert "adversary" not in [h.doc_id for h in res.hits]


class TestStoreRobustness:
    def test_zero_chunk_tensor_payload_accepted(self):
        engine = _mk(name="zc")
        engine.feed("zc", "d1", {"n": 1},
                    {"vec": {"chunks": [], "embeddings": []}})
        assert engine.get("zc", "d1") == {"n": 1}
        assert engine.vector_count("zc") == 0

    def test_snapshot_survives_concurrent_index_delete(self, tmp_path):
        engine = StoreEngine()
        for name in ("snap-a", "snap-b"):
            engine.create_index(IndexDescriptor(name=name,
                                                model_dimensions=4))
            engine.feed(name, "d1", {"n": 1}, {})
        real_shards = engine._shards

        def racing_shards(name):
            if name == "snap-a":
                raise IndexNotFoundError("deleted mid-pass")
            return real_shards(name)

        engine._shards = racing_shards
        engine.snapshot(str(tmp_path))  # must not raise
        engine._shards = real_shards
        restored = StoreEngine()
        assert restored.restore(str(tmp_path)) == 1
        assert restored.get("snap-b", "d1") == {"n": 1}


class TestEnvFallbacks:
    def test_empty_ef_search_env_defaults(self, monkeypatch):
        from marqo_tpu.tensor_search.tensor_search import _default_ef_search
        monkeypatch.setenv("MARQO_DEFAULT_EF_SEARCH", "")
        assert _default_ef_search(None, 10, 0) == 2000

    def test_hybrid_honors_approximate_default_env(self, monkeypatch):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.tensor_search import tensor_search
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("hx-env"))
        cfg.index_meta_cache.populate()
        tensor_search.add_documents(cfg, __import__(
            "marqo_tpu.core.models.add_docs_params",
            fromlist=["AddDocsParams"]).AddDocsParams(
                index_name="hx-env", docs=[{"_id": "1", "t": "hello"}],
                tensor_fields=["t"]))
        seen = {}
        real = cfg.engine.query_hybrid

        def spy(*args, **kwargs):
            seen.update(kwargs)
            return real(*args, **kwargs)

        monkeypatch.setattr(cfg.engine, "query_hybrid", spy)
        monkeypatch.setenv("MARQO_DEFAULT_APPROXIMATE_SEARCH", "FALSE")
        tensor_search.search(cfg, "hx-env", text="hello",
                             search_method="HYBRID")
        assert seen.get("approximate") is False
