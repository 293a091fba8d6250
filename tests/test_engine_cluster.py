"""Cluster engine: sharding + replication + failover across engine servers."""

import numpy as np
import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.engine.cluster import ClusterEngine
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

BASE_PORT = 18200


@pytest.fixture(scope="module")
def cluster():
    # 2 shards × 2 replicas on 4 servers
    backends = [StoreEngine() for _ in range(4)]
    servers = [serve(build_engine_app(b), host="127.0.0.1",
                     port=BASE_PORT + i, background=True)
               for i, b in enumerate(backends)]
    topology = [[f"http://127.0.0.1:{BASE_PORT}",
                 f"http://127.0.0.1:{BASE_PORT + 1}"],
                [f"http://127.0.0.1:{BASE_PORT + 2}",
                 f"http://127.0.0.1:{BASE_PORT + 3}"]]
    engine = ClusterEngine(topology)
    engine.create_index(IndexDescriptor(name="c-idx", model_dimensions=4))
    yield engine, backends, servers
    engine.close()
    for server in servers:
        server.shutdown()


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return (v / np.linalg.norm(v)).tolist()


def _feed_corpus(engine, n=40):
    rng = np.random.default_rng(0)
    for i in range(n):
        vec = rng.standard_normal(4).astype(np.float32)
        vec /= np.linalg.norm(vec)
        engine.feed("c-idx", f"doc{i}", {"n": i, "text": f"document {i}"},
                    {"field": {"chunks": [f"chunk {i}"],
                               "embeddings": [vec.tolist()]}})
    return n


class TestClusterEngine:
    def test_ddl_on_all_nodes(self, cluster):
        engine, backends, _ = cluster
        assert all(b.has_index("c-idx") for b in backends)

    def test_feed_replicated_and_sharded(self, cluster):
        engine, backends, _ = cluster
        n = _feed_corpus(engine)
        assert engine.doc_count("c-idx") == n
        # replicas within a shard hold identical copies
        assert backends[0].doc_count("c-idx") == backends[1].doc_count("c-idx")
        assert backends[2].doc_count("c-idx") == backends[3].doc_count("c-idx")
        # both shards got some documents
        assert backends[0].doc_count("c-idx") > 0
        assert backends[2].doc_count("c-idx") > 0

    def test_get_routes_to_owning_shard(self, cluster):
        engine, _, _ = cluster
        doc = engine.get("c-idx", "doc3")
        assert doc["n"] == 3
        assert engine.get("c-idx", "missing") is None

    def test_query_merges_across_shards(self, cluster):
        engine, backends, _ = cluster
        rng = np.random.default_rng(1)
        q = rng.standard_normal(4).astype(np.float32)
        q /= np.linalg.norm(q)
        res = engine.query_tensor("c-idx", q.tolist(), limit=10)
        assert len(res.hits) == 10
        scores = [h.score for h in res.hits]
        assert scores == sorted(scores, reverse=True)
        # global top-1 matches the best across per-shard results
        local_best = max(
            (backends[i].query_tensor("c-idx", q, limit=1).hits[0]
             for i in (0, 2)), key=lambda h: h.score)
        assert res.hits[0].doc_id == local_best.doc_id

    def test_lexical_across_shards(self, cluster):
        engine, _, _ = cluster
        res = engine.query_lexical("c-idx", ["document"], [], limit=40)
        assert len(res.hits) == 40

    def test_replica_failover(self, cluster):
        engine, backends, servers = cluster
        # kill one replica of shard 0; reads must still succeed
        servers[0].shutdown()
        try:
            for _ in range(4):  # cycle the round-robin past the dead node
                assert engine.doc_count("c-idx") == 40
            doc = engine.get("c-idx", "doc3")
            assert doc["n"] == 3
        finally:
            pass  # server stays down; remaining tests use other fixtures

    def test_delete_after_failover(self, cluster):
        engine, backends, _ = cluster
        # writes succeed while one replica of shard 0 is down (≥1 ack)
        assert engine.delete("c-idx", "doc3") is True
        assert engine.get("c-idx", "doc3") is None


class TestClusterFromEnv:
    def test_engine_from_env_cluster(self, cluster, monkeypatch):
        import json as _json
        from marqo_tpu.engine.client import engine_from_env
        from marqo_tpu.engine.cluster import ClusterEngine
        topology = [[f"http://127.0.0.1:{BASE_PORT + 1}"],
                    [f"http://127.0.0.1:{BASE_PORT + 2}"]]
        monkeypatch.setenv("MARQO_ENGINE_CLUSTER", _json.dumps(topology))
        engine = engine_from_env()
        assert isinstance(engine, ClusterEngine)
        assert len(engine.shards) == 2
        engine.close()


class TestGlobalRRF:
    def test_global_leg_ranking(self, cluster):
        """Cluster hybrid (disjunction+rrf) ranks each leg GLOBALLY across
        shards: the fused top hit must carry leg scores, the tensor leg's
        global best must get the tensor rank-1 contribution, and scores obey
        the rrf bound. (Exact lexical parity with a single node needs global
        IDF — round-2 item; tensor-leg closeness is already global.)"""
        engine, backends, _ = cluster
        rng = np.random.default_rng(1)
        q = rng.standard_normal(4).astype(np.float32)
        q /= np.linalg.norm(q)
        res = engine.query_hybrid("c-idx", q.tolist(), ["document"], [],
                                  limit=10, alpha=0.5, rrf_k=60)
        assert len(res.hits) == 10
        scores = [h.score for h in res.hits]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= 1.0 / 61 + 1e-9 for s in scores)
        # the globally-best tensor doc must appear with rank-1 tensor credit
        tensor_best = engine.query_tensor("c-idx", q.tolist(), limit=1).hits[0]
        top_ids = [h.doc_id for h in res.hits]
        assert tensor_best.doc_id in top_ids
        best_hit = next(h for h in res.hits if h.doc_id == tensor_best.doc_id)
        assert best_hit.raw_tensor_score is not None
        assert abs(best_hit.raw_tensor_score - tensor_best.score) < 1e-6

    def test_alpha_extremes(self, cluster):
        engine, _, _ = cluster
        rng = np.random.default_rng(2)
        q = rng.standard_normal(4).astype(np.float32)
        q /= np.linalg.norm(q)
        tensor_only = engine.query_hybrid("c-idx", q.tolist(), ["document"],
                                          [], limit=5, alpha=1.0)
        tensor_ref = engine.query_tensor("c-idx", q.tolist(), limit=5)
        assert [h.doc_id for h in tensor_only.hits] == \
            [h.doc_id for h in tensor_ref.hits]


class TestReplicaHealing:
    """Replica anti-entropy (cluster.heal): a replica that missed writes
    re-syncs from the replica with the highest durable mutation sequence
    (store.index_digest seq — NOT doc count, which resurrects deletes)."""

    def test_stale_replica_resynced(self):
        from marqo_tpu.engine.cluster import ClusterEngine
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.engine.store import StoreEngine
        from marqo_tpu.api.http_framework import serve

        backends = [StoreEngine() for _ in range(2)]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=18600 + i, background=True)
                   for i, b in enumerate(backends)]
        try:
            engine = ClusterEngine([["http://127.0.0.1:18600",
                                     "http://127.0.0.1:18601"]])
            engine.create_index(IndexDescriptor(name="heal-idx",
                                                model_dimensions=4))
            for i in range(4):
                engine.feed("heal-idx", f"d{i}", {"n": i},
                            {"t": {"chunks": [f"c{i}"],
                                   "embeddings": [_unit([1, i + 1, 0, 0])]}})
            # simulate replica 1 having been down for writes 4..9: they
            # reach only replica 0 (its mutation seq advances; 1's doesn't)
            for i in range(4, 10):
                backends[0].feed("heal-idx", f"d{i}", {"n": i},
                                 {"t": {"chunks": [f"c{i}"],
                                        "embeddings":
                                        [_unit([1, i + 1, 0, 0])]}})
            assert backends[1].doc_count("heal-idx") == 4
            report = engine.heal("heal-idx")
            assert len(report["healed"]) == 1
            assert report["healed"][0]["docs"] == 10
            assert backends[1].doc_count("heal-idx") == 10
            # healed replica serves tensors too
            res = backends[1].query_tensor("heal-idx", _unit([1, 8, 0, 0]),
                                           limit=1, approximate=False)
            assert res.hits[0].doc_id == "d7"
            # converged: heal again is a no-op
            assert engine.heal("heal-idx")["healed"] == []
            engine.close()
        finally:
            for server in servers:
                server.shutdown()

    def test_missed_delete_is_not_resurrected(self):
        """The round-4 verdict bug: replica 1 misses a DELETE, so it holds
        MORE docs; doc-count election would crown it and push the deleted
        doc back onto the healthy replica. Seq election must instead
        propagate the delete to replica 1."""
        from marqo_tpu.engine.cluster import ClusterEngine
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.engine.store import StoreEngine
        from marqo_tpu.api.http_framework import serve

        backends = [StoreEngine() for _ in range(2)]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=18620 + i, background=True)
                   for i, b in enumerate(backends)]
        try:
            engine = ClusterEngine([["http://127.0.0.1:18620",
                                     "http://127.0.0.1:18621"]])
            engine.create_index(IndexDescriptor(name="del-idx",
                                                model_dimensions=4))
            for i in range(6):
                engine.feed("del-idx", f"d{i}", {"n": i}, {})
            # the delete reaches only replica 0 (replica 1 was down)
            assert backends[0].delete("del-idx", "d3") is True
            assert backends[0].doc_count("del-idx") == 5
            assert backends[1].doc_count("del-idx") == 6
            report = engine.heal("del-idx")
            assert len(report["healed"]) == 1
            # the delete propagated — d3 stays dead on BOTH replicas
            assert backends[0].get("del-idx", "d3") is None
            assert backends[1].get("del-idx", "d3") is None
            assert backends[0].doc_count("del-idx") == 5
            assert backends[1].doc_count("del-idx") == 5
            assert engine.heal("del-idx")["healed"] == []
            engine.close()
        finally:
            for server in servers:
                server.shutdown()

    def test_auto_heal_after_failed_replica_write(self):
        """Failover-triggered anti-entropy: a write that reaches only some
        replicas flags the shard degraded; the background loop repairs it
        without a manual /ops/heal call (Vespa distributor role)."""
        import time
        from marqo_tpu.engine.cluster import ClusterEngine
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.engine.store import StoreEngine
        from marqo_tpu.api.http_framework import serve

        backends = [StoreEngine() for _ in range(2)]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=18630 + i, background=True)
                   for i, b in enumerate(backends)]
        try:
            engine = ClusterEngine([["http://127.0.0.1:18630",
                                     "http://127.0.0.1:18631"]],
                                   heal_interval_s=3600)
            engine.create_index(IndexDescriptor(name="auto-idx",
                                                model_dimensions=4))
            for i in range(3):
                engine.feed("auto-idx", f"d{i}", {"n": i}, {})
            # take replica 1 down. shutdown() only stops the accept loop —
            # the client's keepalive socket would still reach the handler
            # thread, so ALSO swap in a fresh client (in production the
            # dead process's sockets RST; in-process we simulate that by
            # dropping the pooled connections)
            from marqo_tpu.engine.client import RemoteStoreEngine
            servers[1].shutdown()
            servers[1].server_close()
            engine.shards[0].replicas[1].close()
            engine.shards[0].replicas[1] = RemoteStoreEngine(
                "http://127.0.0.1:18631")
            engine.feed("auto-idx", "d3", {"n": 3}, {})
            assert engine.shards[0].degraded is True
            # replica 1 comes back empty-behind (server restart, same store)
            servers[1] = serve(build_engine_app(backends[1]),
                               host="127.0.0.1", port=18631, background=True)
            deadline = time.time() + 10
            while time.time() < deadline and \
                    backends[1].get("auto-idx", "d3") is None:
                time.sleep(0.2)
            assert backends[1].get("auto-idx", "d3") == {"n": 3}
            assert engine.shards[0].degraded is False
            engine.close()
        finally:
            for server in servers:
                server.shutdown()

    def test_heal_skips_agreeing_replicas(self):
        from marqo_tpu.engine.cluster import ClusterEngine
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.engine.store import StoreEngine
        from marqo_tpu.api.http_framework import serve

        backends = [StoreEngine() for _ in range(2)]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=18610 + i, background=True)
                   for i, b in enumerate(backends)]
        try:
            engine = ClusterEngine([["http://127.0.0.1:18610",
                                     "http://127.0.0.1:18611"]])
            engine.create_index(IndexDescriptor(name="ok-idx",
                                                model_dimensions=4))
            engine.feed("ok-idx", "a", {"n": 1}, {})
            assert engine.heal("ok-idx")["healed"] == []
            engine.close()
        finally:
            for server in servers:
                server.shutdown()
