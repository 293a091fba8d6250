"""Coordinator restart safety (round-5 VERDICT item 6).

The engine-hosted DDL lock (engine/coordination.py) is process-local to one
engine server: a restart silently frees every lock mid-operation. These
tests prove the system's ACTUAL safety property — the settings store's
optimistic versioning (settings_store.py save: target must be
current+1, reference VespaApplicationPackage session-compare-and-set) —
holds across that loss: a writer resuming with a stale base loses the
version race and is REJECTED instead of clobbering the second writer.

Scenario (kill-and-restart DDL race):
  1. replica A acquires the engine DDL lock and reads settings v1
  2. the coordinator (engine server) restarts → lock state evaporates
  3. replica B acquires the lock (fresh coordinator grants it), writes v2
  4. A resumes its write against base v1 → version conflict, rejected
"""

import threading

import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.core.distributed_lock import EngineDistributedLock
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

PORT = 18660


@pytest.fixture
def coordinator_server():
    """A restartable engine server; .restart() simulates the coordinator
    crash (fresh Coordinator instance, same port)."""

    class Handle:
        def __init__(self):
            self.server = None
            self.start()

        def start(self):
            self.server = serve(build_engine_app(StoreEngine()),
                                host="127.0.0.1", port=PORT, background=True)

        def restart(self):
            self.server.shutdown()
            self.server.server_close()
            self.start()

        def stop(self):
            self.server.shutdown()
            self.server.server_close()

    handle = Handle()
    yield handle
    handle.stop()


class TestCoordinatorRestart:
    def test_restart_frees_lock_but_versioning_rejects_stale_writer(
            self, coordinator_server, tmp_path):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.exceptions import OperationConflictError
        from marqo_tpu.core.index_management.settings_store import (
            IndexSettingsStore)

        store = IndexSettingsStore(data_dir=str(tmp_path))
        store.bootstrap()
        base = IndexSettings(model="test").to_marqo_index("race-idx")
        store.save(base)  # v1

        url = f"http://127.0.0.1:{PORT}"
        lock_a = EngineDistributedLock(url, ttl=300.0)

        # 1. A holds the DDL lock; B cannot enter
        assert lock_a.acquire() is True
        assert EngineDistributedLock(url, ttl=300.0).acquire() is False

        # 2. coordinator restarts mid-operation → lock state lost (a dead
        #    process RSTs its sockets; in-process we model that with fresh
        #    client connections after the restart)
        coordinator_server.restart()

        # 3. B acquires on the fresh coordinator and completes its update
        lock_b = EngineDistributedLock(url, ttl=300.0)
        assert lock_b.acquire() is True
        b_doc = store.get("race-idx").copy(deep=True)
        b_doc.marqo_version = "b-wrote-this"
        b_doc.version = 2  # computed from base v1
        store.save(b_doc, allow_existing=True)
        lock_b.release()
        assert store.get("race-idx").version == 2

        # 4. A resumes, still believing it holds the lock, and writes its
        #    update computed from the SAME base v1 → must be rejected
        a_doc = base.copy(deep=True)
        a_doc.marqo_version = "a-stale-write"
        a_doc.version = 2
        with pytest.raises(OperationConflictError, match="version"):
            store.save(a_doc, allow_existing=True)

        # B's write survives untouched
        assert store.get("race-idx").version == 2
        assert store.get("race-idx").marqo_version == "b-wrote-this"

    def test_ttl_expiry_same_race_is_also_safe(self, tmp_path):
        """The same property without a restart: A's TTL lapses, B enters.
        (TTL loss and coordinator loss are the two stale-holder paths.)"""
        import time

        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.exceptions import OperationConflictError
        from marqo_tpu.core.index_management.settings_store import (
            IndexSettingsStore)
        from marqo_tpu.engine.coordination import Coordinator

        coord = Coordinator()
        assert coord.lock_acquire("ddl", "A", ttl=0.05) is True
        assert coord.lock_acquire("ddl", "B", ttl=60.0) is False
        time.sleep(0.08)  # A's TTL lapses
        assert coord.lock_acquire("ddl", "B", ttl=60.0) is True

        store = IndexSettingsStore(data_dir=str(tmp_path))
        store.bootstrap()
        base = IndexSettings(model="test").to_marqo_index("ttl-idx")
        store.save(base)
        b_doc = store.get("ttl-idx").copy(deep=True)
        b_doc.version = 2
        store.save(b_doc, allow_existing=True)
        stale = base.copy(deep=True)
        stale.version = 2
        with pytest.raises(OperationConflictError):
            store.save(stale, allow_existing=True)

    def test_semaphores_also_reset_but_bounded_by_ttl(self,
                                                      coordinator_server):
        """Throttle semaphores on a restarted coordinator: counts reset to
        zero (fail-open, the documented posture for throttling) — requests
        re-admit rather than deadlock."""
        import httpx

        url = f"http://127.0.0.1:{PORT}"
        with httpx.Client(base_url=url) as client:
            r = client.post("/engine/coordination/semaphore/acquire",
                            json={"name": "s", "owner": "w1", "limit": 1,
                                  "ttl": 300})
            assert r.json()["acquired"] is True
            r = client.post("/engine/coordination/semaphore/acquire",
                            json={"name": "s", "owner": "w2", "limit": 1,
                                  "ttl": 300})
            assert r.json()["acquired"] is False
        coordinator_server.restart()
        with httpx.Client(base_url=url) as client:
            r = client.post("/engine/coordination/semaphore/acquire",
                            json={"name": "s", "owner": "w2", "limit": 1,
                                  "ttl": 300})
            assert r.json()["acquired"] is True  # fail-open after restart


class TestCreateCompensation:
    def test_failed_engine_deploy_rolls_back_settings(self):
        """A failed engine create must not strand a settings entry that
        makes every retry 409 while the engine has no index."""
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.exceptions import (BackendCommunicationError,
                                               IndexNotFoundError)
        from marqo_tpu.core.index_management.index_management import \
            IndexManagement
        from marqo_tpu.core.index_management.settings_store import \
            IndexSettingsStore
        from marqo_tpu.engine.store import StoreEngine

        engine = StoreEngine()
        mgmt = IndexManagement(engine, IndexSettingsStore())
        mgmt.settings_store.bootstrap()
        index = IndexSettings(model="random").to_marqo_index("comp-idx")

        real_create = engine.create_index
        calls = {"n": 0}

        def flaky_create(descriptor):
            calls["n"] += 1
            if calls["n"] == 1:
                raise BackendCommunicationError("engine down")
            return real_create(descriptor)

        engine.create_index = flaky_create
        with pytest.raises(BackendCommunicationError):
            mgmt.create_index(index)
        # settings rolled back: the name is free again
        with pytest.raises(IndexNotFoundError):
            mgmt.get_index("comp-idx")
        # retry succeeds once the engine recovers
        created = mgmt.create_index(index)
        assert created.name == "comp-idx"
        assert engine.has_index(mgmt.get_index("comp-idx").schema_name)
