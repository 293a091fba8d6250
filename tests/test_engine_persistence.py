"""Engine snapshot/restore: documents + tensors survive a restart; lexical
and ANN state rebuild from the snapshot."""

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import StoreEngine


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return (v / np.linalg.norm(v)).tolist()


class TestEngineSnapshot:
    def test_roundtrip(self, tmp_path):
        eng = StoreEngine(n_shards=2)
        eng.create_index(IndexDescriptor(name="p-idx", model_dimensions=4))
        eng.feed("p-idx", "a", {"title": "red apple", "price": 3},
                 {"title": {"chunks": ["red apple"],
                            "embeddings": [_unit([1, 0, 0, 0])]}})
        eng.feed("p-idx", "b", {"title": "green pear", "price": 5},
                 {"title": {"chunks": ["green pear"],
                            "embeddings": [_unit([0, 1, 0, 0])]}})
        written = eng.snapshot(str(tmp_path))
        assert written == 2

        fresh = StoreEngine(n_shards=2)
        restored = fresh.restore(str(tmp_path))
        assert restored == 2
        assert fresh.doc_count("p-idx") == 2
        assert fresh.get("p-idx", "a")["title"] == "red apple"
        # tensor search works (embeddings restored)
        res = fresh.query_tensor("p-idx", _unit([1, 0, 0, 0]), limit=1)
        assert res.hits[0].doc_id == "a"
        # lexical rebuilt
        res = fresh.query_lexical("p-idx", ["pear"], [], limit=5)
        assert res.hits[0].doc_id == "b"
        # filters on restored fields
        from marqo_tpu.core.search.search_filter import MarqoFilterStringParser
        f = MarqoFilterStringParser().parse("price:[4 TO 10]")
        res = fresh.query_tensor("p-idx", _unit([1, 0, 0, 0]), limit=5,
                                 search_filter=f)
        assert [h.doc_id for h in res.hits] == ["b"]

    def test_snapshot_prunes_deleted_indexes(self, tmp_path):
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="keep", model_dimensions=4))
        eng.create_index(IndexDescriptor(name="drop", model_dimensions=4))
        eng.snapshot(str(tmp_path))
        eng.delete_index("drop")
        eng.snapshot(str(tmp_path))
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        assert fresh.list_indexes() == ["keep"]

    def test_restore_skips_existing(self, tmp_path):
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="dup", model_dimensions=4))
        eng.feed("dup", "x", {"n": 1}, {})
        eng.snapshot(str(tmp_path))
        # restore into the same engine: index exists → skipped, no error
        assert eng.restore(str(tmp_path)) == 0
        assert eng.doc_count("dup") == 1


class TestHnswPersistence:
    def test_hnsw_blob_restored_not_rebuilt(self, tmp_path):
        from marqo_tpu.engine.native import native_available
        if not native_available():
            pytest.skip("native engine not built")
        from marqo_tpu.engine.descriptor import TensorFieldDescriptor
        rng = np.random.default_rng(0)
        n, d = 1500, 16
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(
            name="h-idx", model_dimensions=d,
            tensor_fields=[TensorFieldDescriptor(name="v", dimensions=d)]))
        vectors = rng.standard_normal((n, d)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        for i in range(n):
            eng.feed("h-idx", f"d{i}", {"n": i},
                     {"v": {"chunks": [f"c{i}"],
                            "embeddings": [vectors[i]]}})
        # force HNSW build + verify, then snapshot WITH the graph
        res = eng.query_tensor("h-idx", vectors[7], limit=1,
                               approximate=True)
        assert res.hits[0].doc_id == "d7"
        eng.snapshot(str(tmp_path))

        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        ts = fresh._shards("h-idx")[0].tensors["v"]
        assert ts._hnsw is not None  # loaded from blob, no rebuild
        assert len(ts._hnsw) == n
        res = fresh.query_tensor("h-idx", vectors[7], limit=1,
                                 approximate=True)
        assert res.hits[0].doc_id == "d7"
        # mutations after restore keep working
        fresh.delete("h-idx", "d7")
        res = fresh.query_tensor("h-idx", vectors[7], limit=1,
                                 approximate=True)
        assert res.hits[0].doc_id != "d7"


class TestBootRestore:
    def test_on_start_restores_engine_data(self, tmp_path, monkeypatch):
        """Full restart cycle: settings + documents survive via
        MARQO_ENGINE_DATA_DIR (reference: Vespa app package + content
        durability)."""
        import os
        from marqo_tpu.api.app import on_start
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.inference import vectorise as inference
        from marqo_tpu.tensor_search import tensor_search

        monkeypatch.setenv("MARQO_ENGINE_DATA_DIR", str(tmp_path))
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[]")
        inference.clear_loaded_models()

        # first "process": create, ingest, snapshot
        cfg1 = Config()
        on_start(cfg1)
        cfg1.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("durable"))
        cfg1.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg1, AddDocsParams(
            index_name="durable",
            docs=[{"_id": "p1", "text": "persistent hello"}],
            tensor_fields=["text"]))
        assert res["errors"] is False
        cfg1.engine.snapshot(os.path.join(str(tmp_path), "engine_data"))
        cfg1.index_meta_cache.stop_refresh_thread()

        # second "process": fresh Config restores everything at boot
        cfg2 = Config()
        on_start(cfg2)
        cfg2.index_meta_cache.populate()
        assert cfg2.engine.doc_count("durable") == 1
        out = tensor_search.search(cfg2, "durable", text="persistent hello")
        assert out["hits"][0]["_id"] == "p1"
        cfg2.index_meta_cache.stop_refresh_thread()
        inference.clear_loaded_models()


class TestIncrementalSnapshots:
    def test_unchanged_index_not_rewritten(self, tmp_path):
        import os
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="inc", model_dimensions=4))
        eng.feed("inc", "a", {"t": "x"}, {})
        eng.snapshot(str(tmp_path))
        path = tmp_path / "inc.engine.json"
        first_mtime = os.path.getmtime(path)
        # idle snapshot: no mutations → file untouched
        import time
        time.sleep(0.02)
        eng.snapshot(str(tmp_path))
        assert os.path.getmtime(path) == first_mtime
        # mutation → rewritten
        eng.feed("inc", "b", {"t": "y"}, {})
        eng.snapshot(str(tmp_path))
        assert os.path.getmtime(path) > first_mtime

    def test_delete_counts_as_mutation(self, tmp_path):
        import os, time
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="inc2", model_dimensions=4))
        eng.feed("inc2", "a", {"t": "x"}, {})
        eng.snapshot(str(tmp_path))
        path = tmp_path / "inc2.engine.json"
        mtime = os.path.getmtime(path)
        time.sleep(0.02)
        eng.delete("inc2", "a")
        eng.snapshot(str(tmp_path))
        assert os.path.getmtime(path) > mtime
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        assert fresh.doc_count("inc2") == 0

    def test_missing_file_forces_rewrite(self, tmp_path):
        """A deleted/corrupted snapshot file must be rewritten even with no
        new mutations (version match alone is not enough)."""
        import os
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="inc3", model_dimensions=4))
        eng.feed("inc3", "a", {"t": "x"}, {})
        eng.snapshot(str(tmp_path))
        os.unlink(tmp_path / "inc3.engine.json")
        eng.snapshot(str(tmp_path))
        assert (tmp_path / "inc3.engine.json").exists()


class TestMutationSequenceDurability:
    """The heal election key (index_digest seq) must survive restarts:
    snapshot persists it, restore resumes it, sync adopts the source's."""

    def test_seq_survives_snapshot_restore(self, tmp_path):
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="seq-idx", model_dimensions=4))
        for i in range(5):
            eng.feed("seq-idx", f"d{i}", {"n": i}, {})
        eng.delete("seq-idx", "d2")  # seq advances past doc count
        seq_before = eng.index_digest("seq-idx")["seq"]
        assert seq_before >= 7  # create + 5 feeds + delete
        eng.snapshot(str(tmp_path))
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        digest = fresh.index_digest("seq-idx")
        assert digest["doc_count"] == 4
        assert digest["seq"] >= seq_before
        # restarted replica must not LOSE the election to its old self: a
        # peer that only saw the feeds (no delete) stays behind
        peer = StoreEngine()
        peer.create_index(IndexDescriptor(name="seq-idx",
                                          model_dimensions=4))
        for i in range(5):
            peer.feed("seq-idx", f"d{i}", {"n": i}, {})
        assert peer.index_digest("seq-idx")["seq"] < digest["seq"]

    def test_sync_adopts_source_seq(self):
        src = StoreEngine()
        src.create_index(IndexDescriptor(name="s", model_dimensions=4))
        for i in range(4):
            src.feed("s", f"d{i}", {"n": i}, {})
        src.delete("s", "d0")
        dst = StoreEngine()
        dst.load_index_dump(src.dump_index("s"))
        assert dst.index_digest("s")["seq"] >= src.index_digest("s")["seq"]
        assert dst.doc_count("s") == 3
