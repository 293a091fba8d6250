"""Feed-block interaction with replica repair + health flag sourcing.

Round-5 review fixes. Reference behaviors targeted:
  - Vespa blocks the WHOLE cluster's feed when one content node exceeds a
    resource limit (cluster-controller resource limits → 507) — a full
    node is never quietly written short and back-filled by repair.
  - Internal repair must not fill an out-of-space node to ENOSPC with the
    very writes its watermark refused.
  - /health resource flags reflect the CONTENT NODES' state (reference
    monitoring.py:89-154 aggregates content-node feed-block metrics), not
    the API host's local memory.
  - vectorNumericType defaults are operator-overridable via
    MARQO_ENGINE_CELL_TYPE without clients changing settings documents.
"""

import threading

import numpy as np
import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.core.exceptions import (BackendCommunicationError,
                                       EngineOutOfSpaceError)
from marqo_tpu.engine.client import EngineHTTPError
from marqo_tpu.engine.cluster import ClusterEngine, _ShardGroup
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

BASE_PORT = 18760


@pytest.fixture
def blocked_memory(monkeypatch):
    monkeypatch.setenv("MARQO_ENGINE_MEMORY_WATERMARK", "0.0")


def _mk_engine(name="fbx", docs=0):
    engine = StoreEngine()
    engine.create_index(IndexDescriptor(name=name, model_dimensions=4))
    for i in range(docs):
        engine.feed(name, f"d{i}", {"n": i}, {})
    return engine


class TestSyncRespectsWatermark:
    def test_sync_refused_when_blocked_and_old_copy_intact(
            self, monkeypatch):
        source = _mk_engine(docs=3)
        dest = _mk_engine(docs=2)
        dump = source.dump_index("fbx")
        monkeypatch.setenv("MARQO_ENGINE_MEMORY_WATERMARK", "0.0")
        with pytest.raises(EngineOutOfSpaceError):
            dest.load_index_dump(dump)
        # refused UP FRONT: the destination's current copy is untouched
        # (a half-applied dump with the old copy deleted would be worse)
        assert dest.doc_count("fbx") == 2
        monkeypatch.setenv("MARQO_ENGINE_MEMORY_WATERMARK", "0.999")
        assert dest.load_index_dump(dump) == 3
        assert dest.doc_count("fbx") == 3


class TestRecoveryBypassThreadScoped:
    def test_other_threads_keep_their_watermark_check(self, blocked_memory):
        engine = _mk_engine()
        results = {}

        def other_thread_feed():
            try:
                engine.feed("fbx", "other", {"n": 1}, {})
                results["other"] = "fed"
            except EngineOutOfSpaceError:
                results["other"] = "refused"

        with engine._recovering():
            engine.feed("fbx", "mine", {"n": 0}, {})  # bypass on THIS thread
            t = threading.Thread(target=other_thread_feed)
            t.start()
            t.join()
        assert results["other"] == "refused"
        assert engine.get("fbx", "mine") is not None
        # bypass ends with the context on this thread too
        with pytest.raises(EngineOutOfSpaceError):
            engine.feed("fbx", "after", {"n": 2}, {})

    def test_parallel_recoveries_cannot_corrupt_depth(self, blocked_memory):
        """The round-4 implementation kept a shared int ('+= 1' data race):
        two concurrent recoveries could leave depth == -1 forever,
        permanently disabling the watermark. Thread-local depth makes the
        interleaving harmless by construction — hammer it and verify the
        watermark still holds afterwards."""
        engine = _mk_engine()

        def recover_loop():
            for _ in range(200):
                with engine._recovering():
                    pass

        threads = [threading.Thread(target=recover_loop) for _ in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        with pytest.raises(EngineOutOfSpaceError):
            engine.feed("fbx", "post", {"n": 1}, {})


class _StubReplica:
    def __init__(self, exc=None):
        self.exc = exc
        self.base_url = "stub://replica"
        self.fed = 0

    def feed(self, *args, **kwargs):
        if self.exc is not None:
            raise self.exc
        self.fed += 1


class TestWriteAllFeedBlock:
    def _group(self, replicas):
        group = _ShardGroup.__new__(_ShardGroup)
        group.replicas = replicas
        group._lock = threading.Lock()
        group.degraded = False
        return group

    def test_507_from_any_replica_fails_the_write(self):
        ok = _StubReplica()
        full = _StubReplica(EngineHTTPError(507, "out of space"))
        group = self._group([ok, full])
        with pytest.raises(EngineHTTPError) as err:
            group.write_all("feed", "idx", "d1", {})
        assert err.value.status == 507
        # the acked replica diverged from the refused one: flag for repair
        assert group.degraded is True
        assert ok.fed == 1

    def test_507_without_any_ack_does_not_flag(self):
        full = _StubReplica(EngineHTTPError(507, "out of space"))
        group = self._group([full])
        with pytest.raises(EngineHTTPError):
            group.write_all("feed", "idx", "d1", {})
        assert group.degraded is False  # nothing applied → no divergence

    def test_transient_failures_keep_quorum_semantics(self):
        ok = _StubReplica()
        down = _StubReplica(ConnectionError("refused"))
        group = self._group([ok, down])
        # one per-replica result from the surviving replica
        assert len(group.write_all("feed", "idx", "d1", {})) == 1
        assert group.degraded is True
        group2 = self._group([_StubReplica(ConnectionError("refused"))])
        with pytest.raises(BackendCommunicationError):
            group2.write_all("feed", "idx", "d1", {})


class TestHealReportsFailures:
    @pytest.fixture()
    def pair(self):
        backends = [StoreEngine(), StoreEngine()]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=BASE_PORT + i, background=True)
                   for i, b in enumerate(backends)]
        topology = [[f"http://127.0.0.1:{BASE_PORT}",
                     f"http://127.0.0.1:{BASE_PORT + 1}"]]
        engine = ClusterEngine(topology, heal_interval_s=-1)
        engine.create_index(IndexDescriptor(name="hf-idx",
                                            model_dimensions=4))
        yield engine, backends
        engine.close()
        for server in servers:
            server.shutdown()

    def test_blocked_destination_reported_failed_then_heals(
            self, pair, monkeypatch):
        engine, backends = pair
        engine.feed("hf-idx", "d0", {"n": 0}, {})
        # replica 1 misses two writes (direct feed to replica 0 advances
        # its durable mutation seq → it wins the heal election)
        backends[0].feed("hf-idx", "d1", {"n": 1}, {})
        backends[0].feed("hf-idx", "d2", {"n": 2}, {})
        monkeypatch.setenv("MARQO_ENGINE_MEMORY_WATERMARK", "0.0")
        report = engine.heal("hf-idx")
        assert report["healed"] == []
        assert len(report["failed"]) == 1
        assert report["failed"][0]["shard"] == 0
        # space frees → the same divergence repairs
        monkeypatch.setenv("MARQO_ENGINE_MEMORY_WATERMARK", "0.999")
        report = engine.heal("hf-idx")
        assert len(report["healed"]) == 1
        assert backends[1].doc_count("hf-idx") == 3
        assert report["failed"] == []


class _FakeMetaCache:
    def get_index(self, name):
        return None


class _FakeConfig:
    def __init__(self, engine):
        self.engine = engine
        self.index_meta_cache = _FakeMetaCache()


class _FakeRemoteEngine:
    """Engine whose health body carries content-node resource flags."""

    def __init__(self, nodes):
        self._nodes = nodes

    def engine_health(self):
        rank = {"green": 0, "yellow": 1, "red": 2}
        worst = max((n["status"] for n in self._nodes),
                    key=lambda s: rank[s])
        return {"status": worst, "nodes": self._nodes}


class TestHealthFlagsComeFromContentNodes:
    def test_remote_node_pressure_not_masked_by_healthy_api_host(self):
        from marqo_tpu.core.monitoring import Monitoring
        engine = _FakeRemoteEngine([
            {"url": "http://n1", "status": "yellow",
             "memoryIsAvailable": False, "storageIsAvailable": True}])
        health = Monitoring(_FakeConfig(engine)).get_health()
        assert health["backend"]["memoryIsAvailable"] is False
        assert health["backend"]["status"] == "yellow"
        assert health["status"] == "yellow"

    def test_api_host_pressure_does_not_flip_remote_flags(
            self, blocked_memory):
        from marqo_tpu.core.monitoring import Monitoring
        engine = _FakeRemoteEngine([
            {"url": "http://n1", "status": "green",
             "memoryIsAvailable": True, "storageIsAvailable": True}])
        health = Monitoring(_FakeConfig(engine)).get_health()
        # the remote content node is fine; the API host's own watermark
        # must not masquerade as backend feed-block
        assert health["backend"]["memoryIsAvailable"] is True
        assert health["backend"]["status"] == "green"

    def test_in_process_engine_reports_local_flags(self, blocked_memory):
        from marqo_tpu.core.monitoring import Monitoring
        health = Monitoring(_FakeConfig(_mk_engine())).get_health()
        # in-process: this host IS the content node
        assert health["backend"]["memoryIsAvailable"] is False
        assert health["backend"]["status"] == "yellow"


class TestCellTypeOperatorDefault:
    def test_env_default_applies_when_unspecified(self, monkeypatch):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.models.marqo_index import VectorNumericType
        monkeypatch.setenv("MARQO_ENGINE_CELL_TYPE", "bfloat16")
        index = IndexSettings(model="test").to_marqo_index("ct-a")
        assert index.vector_numeric_type == VectorNumericType.Bfloat16

    def test_explicit_setting_wins_over_env(self, monkeypatch):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.models.marqo_index import VectorNumericType
        monkeypatch.setenv("MARQO_ENGINE_CELL_TYPE", "bfloat16")
        index = IndexSettings(model="test",
                              vectorNumericType="float").to_marqo_index("ct-b")
        assert index.vector_numeric_type == VectorNumericType.Float

    def test_reference_default_unchanged_without_env(self):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.models.marqo_index import VectorNumericType
        index = IndexSettings(model="test").to_marqo_index("ct-c")
        assert index.vector_numeric_type == VectorNumericType.Float
        # GET-settings rendering keeps the reference default
        from marqo_tpu.api.models.index_settings import IndexSettings as S
        assert S.from_marqo_index(index)["vectorNumericType"] == "float"


class TestAutoHealLoopRetainsSignal:
    """The sweep clears degraded flags before healing; a failed sweep (or
    a failed per-replica sync) must re-flag, else the divergence is
    silently dropped until the next failed write."""

    def _cluster(self, ports):
        backends = [StoreEngine(), StoreEngine()]
        servers = [serve(build_engine_app(b), host="127.0.0.1",
                         port=p, background=True)
                   for b, p in zip(backends, ports)]
        engine = ClusterEngine(
            [[f"http://127.0.0.1:{p}" for p in ports]],
            heal_interval_s=3600)  # flagged-only ticks every ~2s
        return engine, backends, servers

    def test_sweep_exception_restores_flags(self):
        import time
        ports = (BASE_PORT + 10, BASE_PORT + 11)
        engine, backends, servers = self._cluster(ports)
        try:
            calls = []
            original = engine.heal_all

            def flaky_heal_all():
                calls.append(time.time())
                if len(calls) < 3:
                    raise RuntimeError("node flap during sweep")
                return original()

            engine.heal_all = flaky_heal_all
            engine.shards[0].degraded = True
            deadline = time.time() + 15
            while time.time() < deadline and len(calls) < 3:
                time.sleep(0.2)
            # ≥3 sweeps ran: the flag survived two failed sweeps (the old
            # code cleared it before the first failure and never retried)
            assert len(calls) >= 3
            deadline = time.time() + 6
            while time.time() < deadline and engine.shards[0].degraded:
                time.sleep(0.2)
            assert engine.shards[0].degraded is False  # success clears it
        finally:
            engine.close()
            for server in servers:
                server.shutdown()

    def test_failed_sync_entries_reflag(self):
        import time
        ports = (BASE_PORT + 12, BASE_PORT + 13)
        engine, backends, servers = self._cluster(ports)
        try:
            reports = []

            def failing_sync_heal_all():
                reports.append(1)
                return {"idx": {"healed": [],
                                "failed": [{"shard": 0,
                                            "replica": "http://x",
                                            "error": "507"}]}}

            engine.heal_all = failing_sync_heal_all
            engine.shards[0].degraded = True
            deadline = time.time() + 15
            while time.time() < deadline and len(reports) < 2:
                time.sleep(0.2)
            # the loop consumed the flag, saw the failed sync, re-flagged,
            # and retried on the next tick
            assert len(reports) >= 2
            assert engine.shards[0].degraded is True
        finally:
            engine.close()
            for server in servers:
                server.shutdown()
