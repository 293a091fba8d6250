"""Atomic partial update through every engine backend.

Reference: Vespa partial updates are atomic per document (reference
core/document/document.py:107-170 builds assign updates; the content node
applies them under its own document lock). The old repo path did
get → merge → feed, which loses concurrent writes and round-trips every
tensor; StoreEngine.update now merges under the shard lock.
"""

import threading

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.store import StoreEngine


def _mk(name="au"):
    engine = StoreEngine()
    engine.create_index(IndexDescriptor(
        name=name, model_dimensions=4,
        tensor_fields=[TensorFieldDescriptor(name="vec", dimensions=4)],
        dynamic_fields=True))
    return engine


class TestStoreUpdate:
    def test_merges_fields_and_preserves_tensors(self):
        engine = _mk()
        vec = (np.ones(4) / 2).tolist()
        engine.feed("au", "d1", {"title": "old", "views": 1},
                    {"vec": {"chunks": ["c"], "embeddings": [vec]}})
        assert engine.update("au", "d1", {"views": 2, "flag": True})
        assert engine.get("au", "d1") == {"title": "old", "views": 2,
                                          "flag": True}
        tensors = engine.get_tensors("au", "d1")
        assert tensors["vec"][0]["chunk"] == "c"
        np.testing.assert_allclose(tensors["vec"][0]["embedding"], vec)

    def test_missing_doc_returns_false(self):
        engine = _mk()
        assert engine.update("au", "ghost", {"x": 1}) is False

    def test_lexical_index_follows_text_update(self):
        engine = _mk()
        engine.feed("au", "d1", {"text": "ancient words"}, {})
        engine.update("au", "d1", {"text": "modern phrase"})
        hits = engine.query_lexical("au", ["modern"], [], limit=10).hits
        assert [h.doc_id for h in hits] == ["d1"]
        assert engine.query_lexical("au", ["ancient"], [], limit=10).hits == []

    def test_concurrent_updates_lose_nothing(self):
        """N threads each updating a DISTINCT field must all land — the
        exact interleaving the old read-modify-write lost."""
        engine = _mk()
        engine.feed("au", "d1", {"base": 0}, {})
        n = 8

        def bump(i):
            for _ in range(50):
                engine.update("au", "d1", {f"f{i}": i})

        threads = [threading.Thread(target=bump, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        doc = engine.get("au", "d1")
        assert doc["base"] == 0
        for i in range(n):
            assert doc[f"f{i}"] == i

    def test_wal_replays_update(self, tmp_path):
        from marqo_tpu.engine.wal import WriteAheadLog
        engine = _mk()
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        engine.attach_wal(wal)
        engine.feed("au", "d1", {"n": 1}, {})
        engine.update("au", "d1", {"n": 2, "tag": "x"})
        wal.close()
        restored = StoreEngine()
        restored.create_index(IndexDescriptor(name="au", model_dimensions=4,
                                              dynamic_fields=True))
        restored.replay_wal(WriteAheadLog(str(tmp_path / "wal.log")))
        assert restored.get("au", "d1") == {"n": 2, "tag": "x"}


class TestServerClientUpdate:
    @pytest.fixture
    def client(self):
        from marqo_tpu.engine.client import RemoteStoreEngine
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.api.http_framework import serve
        engine = StoreEngine()
        srv = serve(build_engine_app(engine), host="127.0.0.1", port=0,
                    background=True)
        try:
            yield RemoteStoreEngine(
                f"http://127.0.0.1:{srv.server_address[1]}")
        finally:
            srv.shutdown()

    def test_update_roundtrip(self, client):
        client.create_index(IndexDescriptor(name="au", model_dimensions=4,
                                            dynamic_fields=True))
        client.feed("au", "d1", {"n": 1})
        assert client.update("au", "d1", {"n": 2}) is True
        assert client.get("au", "d1") == {"n": 2}
        assert client.update("au", "ghost", {"n": 2}) is False


class TestClusterUpdate:
    @pytest.fixture
    def cluster(self):
        from marqo_tpu.engine.cluster import ClusterEngine
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.api.http_framework import serve
        engines = [StoreEngine(), StoreEngine()]
        servers = [serve(build_engine_app(e), host="127.0.0.1", port=0,
                         background=True) for e in engines]
        urls = [f"http://127.0.0.1:{s.server_address[1]}" for s in servers]
        cluster = ClusterEngine([urls])  # one shard, two replicas
        try:
            yield cluster, engines
        finally:
            cluster.close()
            for s in servers:
                s.shutdown()

    def test_update_hits_all_replicas(self, cluster):
        cluster_obj, engines = cluster
        cluster_obj.create_index(IndexDescriptor(
            name="au", model_dimensions=4, dynamic_fields=True))
        cluster_obj.feed("au", "d1", {"n": 1})
        assert cluster_obj.update("au", "d1", {"n": 2}) is True
        for engine in engines:
            assert engine.get("au", "d1") == {"n": 2}
        assert cluster_obj.update("au", "ghost", {"n": 2}) is False

    def test_delete_absent_doc_reports_not_found(self, cluster):
        cluster_obj, _ = cluster
        cluster_obj.create_index(IndexDescriptor(
            name="au", model_dimensions=4, dynamic_fields=True))
        assert cluster_obj.delete("au", "ghost") is False
        cluster_obj.feed("au", "d1", {"n": 1})
        assert cluster_obj.delete("au", "d1") is True
