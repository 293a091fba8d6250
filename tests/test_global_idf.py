"""Global-IDF lexical scoring: BM25 across cluster shards / internal engine
shards must score identically to a single-node single-shard index, even on
skewed corpora where a rare term is concentrated on one shard (the failure
mode of per-shard idf). Semantics target: Vespa's cluster-wide idf
(reference content cluster + HybridSearcher.java:154-285 leg fusion)."""

import numpy as np
import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.engine.cluster import ClusterEngine
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

BASE_PORT = 18300


def _skewed_corpus():
    """60 docs; 'zebra' is rare (4 docs), 'common' is everywhere. Doc text
    lengths vary so avgdl matters too."""
    docs = []
    for i in range(60):
        words = ["common", "filler"] * (1 + i % 5)
        if i % 15 == 0:
            words.append("zebra")
        if i % 2 == 0:
            words.append("even")
        docs.append((f"d{i}", " ".join(words)))
    return docs


def _feed(engine, docs, index="g-idx"):
    for doc_id, text in docs:
        engine.feed(index, doc_id, {"text": text}, {})


def _scores(result):
    return {h.doc_id: pytest.approx(h.score, rel=1e-5) for h in result.hits}


@pytest.fixture(scope="module")
def single_node():
    eng = StoreEngine(n_shards=1)
    eng.create_index(IndexDescriptor(name="g-idx", model_dimensions=4))
    _feed(eng, _skewed_corpus())
    return eng


class TestInternalShards:
    def test_multi_shard_engine_matches_single_shard(self, single_node):
        sharded = StoreEngine(n_shards=4)
        sharded.create_index(IndexDescriptor(name="g-idx",
                                             model_dimensions=4))
        _feed(sharded, _skewed_corpus())
        for query in (["zebra"], ["zebra common"], ["even filler zebra"]):
            ref = single_node.query_lexical("g-idx", query, [], limit=60)
            got = sharded.query_lexical("g-idx", query, [], limit=60)
            assert {h.doc_id for h in got.hits} == \
                {h.doc_id for h in ref.hits}
            ref_scores = {h.doc_id: h.score for h in ref.hits}
            for h in got.hits:
                assert h.score == pytest.approx(ref_scores[h.doc_id],
                                                rel=1e-5), query

    def test_phrase_only_query_matches(self, single_node):
        sharded = StoreEngine(n_shards=3)
        sharded.create_index(IndexDescriptor(name="g-idx",
                                             model_dimensions=4))
        _feed(sharded, _skewed_corpus())
        ref = single_node.query_lexical("g-idx", [], ['"common filler"'],
                                        limit=60)
        got = sharded.query_lexical("g-idx", [], ['"common filler"'],
                                    limit=60)
        ref_scores = {h.doc_id: h.score for h in ref.hits}
        assert len(got.hits) == len(ref.hits)
        for h in got.hits:
            assert h.score == pytest.approx(ref_scores[h.doc_id], rel=1e-5)


@pytest.fixture(scope="module")
def cluster():
    backends = [StoreEngine() for _ in range(3)]
    servers = [serve(build_engine_app(b), host="127.0.0.1",
                     port=BASE_PORT + i, background=True)
               for i, b in enumerate(backends)]
    topology = [[f"http://127.0.0.1:{BASE_PORT + i}"] for i in range(3)]
    engine = ClusterEngine(topology)
    engine.create_index(IndexDescriptor(name="g-idx", model_dimensions=4))
    _feed(engine, _skewed_corpus())
    yield engine, backends
    engine.close()
    for server in servers:
        server.shutdown()


class TestClusterGlobalIdf:
    def test_rare_term_skew_exists(self, cluster):
        """Sanity: the corpus actually skews — zebra docs are NOT spread
        evenly over the 3 shards, so per-shard idf would differ."""
        _engine, backends = cluster
        zebra_counts = []
        for b in backends:
            stats = b.lexical_stats("g-idx", ["zebra"])
            zebra_counts.append(stats.get("text", {}).get("df", {})
                                .get("zebra", 0))
        assert sum(zebra_counts) == 4
        assert len([c for c in zebra_counts if c]) >= 2  # split over shards

    def test_cluster_lexical_matches_single_node(self, cluster, single_node):
        engine, _ = cluster
        for query in (["zebra"], ["zebra common"], ["even filler zebra"]):
            ref = single_node.query_lexical("g-idx", query, [], limit=60)
            got = engine.query_lexical("g-idx", query, [], limit=60)
            assert [h.doc_id for h in got.hits] == \
                [h.doc_id for h in ref.hits], query
            ref_scores = {h.doc_id: h.score for h in ref.hits}
            for h in got.hits:
                assert h.score == pytest.approx(ref_scores[h.doc_id],
                                                rel=1e-5), query

    def test_cluster_hybrid_lexical_leg_matches_single_node(self, cluster,
                                                            single_node):
        engine, _ = cluster
        rng = np.random.default_rng(1)
        vec = rng.standard_normal(4)
        vec /= np.linalg.norm(vec)
        ref = single_node.query_hybrid("g-idx", vec.tolist(), ["zebra"], [],
                                       limit=10)
        got = engine.query_hybrid("g-idx", vec.tolist(), ["zebra"], [],
                                  limit=10)
        ref_lex = {h.doc_id: h.raw_lexical_score for h in ref.hits
                   if h.raw_lexical_score is not None}
        got_lex = {h.doc_id: h.raw_lexical_score for h in got.hits
                   if h.raw_lexical_score is not None}
        assert set(got_lex) == set(ref_lex)
        for doc_id, score in got_lex.items():
            assert score == pytest.approx(ref_lex[doc_id], rel=1e-5)
        # fused ranking identical too (no tensor fields fed -> pure lexical)
        assert [h.doc_id for h in got.hits] == [h.doc_id for h in ref.hits]
