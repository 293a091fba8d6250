"""Honest health aggregation + feed-block watermarks (round-5 VERDICT #3).

Reference behaviors targeted:
  - /health reflects real store node/service state and feed-block metrics
    (src/marqo/core/monitoring/monitoring.py:89-154) — never hardcoded
    green.
  - Vespa refuses feeds above resource limits with HTTP 507; the API's
    per-document translate matrix maps 507 → (400, "Marqo vector store is
    out of memory or disk space") (vespa_client.py:579-607).
  - Index stats carry real memoryUsedPercentage (monitoring.py:27-74).
"""

import numpy as np
import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.core.exceptions import EngineOutOfSpaceError
from marqo_tpu.engine.cluster import ClusterEngine
from marqo_tpu.engine.client import RemoteStoreEngine
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

BASE_PORT = 18700


@pytest.fixture
def blocked_memory(monkeypatch):
    """Force the memory feed-block watermark below any real utilization."""
    monkeypatch.setenv("MARQO_ENGINE_MEMORY_WATERMARK", "0.0")


class TestFeedBlock:
    def test_feed_refused_above_watermark(self, blocked_memory):
        engine = StoreEngine()
        engine.create_index(IndexDescriptor(name="fb", model_dimensions=4))
        with pytest.raises(EngineOutOfSpaceError):
            engine.feed("fb", "d1", {"n": 1}, {})

    def test_feed_allowed_below_watermark(self):
        engine = StoreEngine()
        engine.create_index(IndexDescriptor(name="fb2", model_dimensions=4))
        engine.feed("fb2", "d1", {"n": 1}, {})
        assert engine.doc_count("fb2") == 1

    def test_disk_watermark_also_blocks(self, monkeypatch):
        monkeypatch.setenv("MARQO_ENGINE_DISK_WATERMARK", "0.0")
        engine = StoreEngine()
        engine.create_index(IndexDescriptor(name="fb3", model_dimensions=4))
        with pytest.raises(EngineOutOfSpaceError):
            engine.feed("fb3", "d1", {"n": 1}, {})

    def test_wal_replay_not_blocked(self, tmp_path, blocked_memory):
        """Recovery must replay acknowledged writes even above the
        watermark (Vespa replays its transaction log regardless)."""
        from marqo_tpu.engine.wal import WriteAheadLog
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        descriptor = IndexDescriptor(name="fbr", model_dimensions=4)
        wal.append({"op": "create_index", "descriptor": descriptor.to_json()})
        wal.append({"op": "feed", "index": "fbr", "doc_id": "d1",
                    "fields": {"n": 1}, "tensors": {}})
        wal.close()
        engine = StoreEngine()
        replay = WriteAheadLog(str(tmp_path / "wal.log"))
        assert engine.replay_wal(replay) == 2
        assert engine.doc_count("fbr") == 1

    def test_engine_server_returns_507(self, blocked_memory):
        engine = StoreEngine()
        engine.create_index(IndexDescriptor(name="fbs", model_dimensions=4))
        server = serve(build_engine_app(engine), host="127.0.0.1",
                       port=BASE_PORT, background=True)
        try:
            import httpx
            resp = httpx.post(
                f"http://127.0.0.1:{BASE_PORT}/engine/indexes/fbs/docs",
                json={"id": "d1", "fields": {"n": 1}, "tensors": {}})
            assert resp.status_code == 507
            health = httpx.get(
                f"http://127.0.0.1:{BASE_PORT}/engine/health").json()
            assert health["status"] == "yellow"
            assert health["memoryIsAvailable"] is False
            assert "feed_blocked" in health
        finally:
            server.shutdown()

    def test_add_documents_translates_to_per_doc_400(self, blocked_memory):
        """In-process feed-block takes the 507 row of the translate matrix:
        per-doc status 400 'out of memory or disk space', request-level
        errors=True (reference test_vespa_client.py:433-457 matrix)."""
        from marqo_tpu.config import Config
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.tensor_search import tensor_search
        cfg = Config()
        cfg.index_management.bootstrap()
        # DDL + settings writes are not document feeds; create under the
        # block to prove only feeds are refused
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("fb-api"))
        cfg.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="fb-api", docs=[{"_id": "1", "text": "hello"}],
            tensor_fields=["text"]))
        assert res["errors"] is True
        item = res["items"][0]
        assert item["status"] == 400
        assert "out of memory or disk space" in item["message"]


class TestHealthAggregation:
    def test_in_process_health_green(self):
        from marqo_tpu.config import Config
        cfg = Config()
        cfg.index_management.bootstrap()
        health = cfg.monitoring.get_health()
        assert health["status"] == "green"
        assert health["backend"]["status"] == "green"
        assert health["backend"]["memoryIsAvailable"] is True

    def test_health_yellow_under_feed_block(self, blocked_memory):
        from marqo_tpu.config import Config
        cfg = Config()
        cfg.index_management.bootstrap()
        health = cfg.monitoring.get_health()
        assert health["status"] == "yellow"
        assert health["backend"]["status"] == "yellow"
        assert health["backend"]["memoryIsAvailable"] is False

    def test_remote_engine_red_when_down(self):
        remote = RemoteStoreEngine("http://127.0.0.1:1")  # nothing there
        report = remote.engine_health()
        assert report["status"] == "red"
        remote.close()

    def test_cluster_health_degrades(self):
        """All replicas up → green; one of two down → yellow; whole shard
        down → red (reference aggregates per-service Vespa state)."""
        backends = [StoreEngine() for _ in range(2)]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=BASE_PORT + 10 + i, background=True)
                   for i, b in enumerate(backends)]
        cluster = ClusterEngine([[f"http://127.0.0.1:{BASE_PORT + 10}",
                                  f"http://127.0.0.1:{BASE_PORT + 11}"]])
        try:
            assert cluster.engine_health()["status"] == "green"
            servers[0].shutdown()
            report = cluster.engine_health()
            assert report["status"] == "yellow"
            statuses = {n["url"]: n["status"] for n in report["nodes"]}
            assert statuses[f"http://127.0.0.1:{BASE_PORT + 10}"] == "red"
            servers[1].shutdown()
            assert cluster.engine_health()["status"] == "red"
        finally:
            cluster.close()
            for server in servers:
                try:
                    server.shutdown()
                except Exception:
                    pass

    def test_api_health_reflects_dead_cluster(self, monkeypatch):
        """A configured cluster with every node down must NOT report green
        (the round-4 VERDICT weak #2)."""
        import json as _json
        from marqo_tpu.config import Config
        monkeypatch.setenv(
            "MARQO_ENGINE_CLUSTER",
            _json.dumps([["http://127.0.0.1:1"]]))
        cfg = Config()
        health = cfg.monitoring.get_health()
        assert health["status"] == "red"
        assert health["backend"]["status"] == "red"

    def test_index_stats_memory_used_real(self):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("stats-real"))
        cfg.index_meta_cache.populate()
        stats = cfg.monitoring.get_index_stats("stats-real")
        assert stats["backend"]["memoryUsedPercentage"] > 0.0
        assert stats["backend"]["storageUsedPercentage"] > 0.0
