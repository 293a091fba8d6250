"""Write-ahead log: acknowledged mutations survive a crash between
snapshots (role of Vespa's proton transactionlog — the reference's store
never loses acknowledged writes; our 60s snapshot cadence alone would)."""

import os
import threading

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import StoreEngine
from marqo_tpu.engine.wal import WriteAheadLog


def _vec(i, dims=8):
    rng = np.random.default_rng(i)
    v = rng.standard_normal(dims).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


def _feed(eng, i):
    eng.feed("idx", f"d{i}", {"_id": f"d{i}", "text": f"doc {i}"},
             {"text": {"chunks": [f"doc {i}"], "embeddings": [_vec(i)]}})


class TestWalUnit:
    def test_append_replay_roundtrip(self, tmp_path):
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        records = [{"op": "feed", "index": "i", "doc_id": f"d{i}",
                    "fields": {"x": i}, "tensors": {}} for i in range(5)]
        for r in records:
            wal.append(r)
        wal.close()
        wal2 = WriteAheadLog(str(tmp_path / "wal.log"))
        assert list(wal2.replay()) == records

    def test_torn_tail_stops_cleanly(self, tmp_path):
        path = str(tmp_path / "wal.log")
        wal = WriteAheadLog(path)
        wal.append({"op": "feed", "index": "i", "doc_id": "a",
                    "fields": {}, "tensors": {}})
        wal.append({"op": "feed", "index": "i", "doc_id": "b",
                    "fields": {}, "tensors": {}})
        wal.close()
        # simulate a crash mid-append: truncate the last 3 bytes
        size = os.path.getsize(path)
        with open(path, "r+b") as f:
            f.truncate(size - 3)
        wal2 = WriteAheadLog(path)
        recs = list(wal2.replay())
        assert [r["doc_id"] for r in recs] == ["a"]

    def test_rotation_protocol(self, tmp_path):
        path = str(tmp_path / "wal.log")
        wal = WriteAheadLog(path)
        wal.append({"op": "feed", "index": "i", "doc_id": "pre",
                    "fields": {}, "tensors": {}})
        wal.rotate_begin()
        wal.append({"op": "feed", "index": "i", "doc_id": "post",
                    "fields": {}, "tensors": {}})
        # crash BEFORE rotate_commit: both logs replay, in order
        assert [r["doc_id"] for r in wal.replay()] == ["pre", "post"]
        wal.rotate_commit()
        assert [r["doc_id"] for r in wal.replay()] == ["post"]
        # interrupted rotation (leftover .old) folds in on the next rotate
        wal.rotate_begin()
        wal.append({"op": "feed", "index": "i", "doc_id": "post2",
                    "fields": {}, "tensors": {}})
        wal.rotate_begin()  # .old exists → concatenation
        assert [r["doc_id"] for r in wal.replay()] == ["post", "post2"]
        wal.close()


class TestWalEngine:
    def test_crash_recovery_feeds_after_snapshot(self, tmp_path):
        """Snapshot at t0, acknowledged feeds after t0, crash (no second
        snapshot): a fresh engine must recover every acknowledged write."""
        snap_dir = str(tmp_path / "snap")
        eng = StoreEngine(n_shards=2)
        eng.create_index(IndexDescriptor(name="idx", model_dimensions=8))
        for i in range(10):
            _feed(eng, i)
        eng.snapshot(snap_dir)

        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        eng.attach_wal(wal)
        for i in range(10, 25):
            _feed(eng, i)
        eng.delete("idx", "d3")
        wal.close()  # "crash": no snapshot of the post-t0 state

        eng2 = StoreEngine(n_shards=2)
        eng2.restore(snap_dir)
        wal2 = WriteAheadLog(str(tmp_path / "wal.log"))
        replayed = eng2.replay_wal(wal2)
        assert replayed == 16
        assert eng2.doc_count("idx") == 24  # 25 fed − 1 deleted
        assert eng2.get("idx", "d3") is None
        assert eng2.get("idx", "d20")["text"] == "doc 20"
        res = eng2.query_tensor("idx", _vec(17), limit=1)
        assert res.hits[0].doc_id == "d17"

    def test_ddl_replay(self, tmp_path):
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        eng = StoreEngine()
        eng.attach_wal(wal)
        eng.create_index(IndexDescriptor(name="a", model_dimensions=8))
        eng.create_index(IndexDescriptor(name="b", model_dimensions=8))
        eng.feed("a", "x", {"_id": "x", "t": "hello"},
                 {"t": {"chunks": ["hello"], "embeddings": [_vec(1)]}})
        eng.delete_index("b")
        wal.close()

        eng2 = StoreEngine()
        eng2.replay_wal(WriteAheadLog(str(tmp_path / "wal.log")))
        assert eng2.has_index("a") and not eng2.has_index("b")
        assert eng2.get("a", "x")["t"] == "hello"

    def test_replay_idempotent_over_snapshot(self, tmp_path):
        """Records already captured by the snapshot must be harmless."""
        snap_dir = str(tmp_path / "snap")
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(name="idx", model_dimensions=8))
        eng.attach_wal(wal)
        for i in range(5):
            _feed(eng, i)
        eng.delete("idx", "d1")
        eng.snapshot(snap_dir)  # snapshot AND log both carry these ops
        wal.close()

        eng2 = StoreEngine()
        eng2.restore(snap_dir)
        eng2.replay_wal(WriteAheadLog(str(tmp_path / "wal.log")))
        assert eng2.doc_count("idx") == 4
        assert eng2.get("idx", "d1") is None

    def test_concurrent_append(self, tmp_path):
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        errors = []

        def writer(t):
            try:
                for i in range(200):
                    wal.append({"op": "feed", "index": "i",
                                "doc_id": f"{t}-{i}", "fields": {},
                                "tensors": {}})
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(t,))
                   for t in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wal.close()
        assert not errors
        recs = list(WriteAheadLog(str(tmp_path / "wal.log")).replay())
        assert len(recs) == 800
        assert len({r["doc_id"] for r in recs}) == 800


class TestWalBootPath:
    def test_crash_recovery_through_real_boot(self, tmp_path):
        """Hard-kill after acknowledged feeds (no snapshot tick) → a fresh
        boot recovers every document via WAL replay (on_start wiring)."""
        import subprocess
        import sys

        boot_feed = (
            "import os, sys\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "os.environ['MARQO_ENGINE_DATA_DIR'] = sys.argv[1]\n"
            "from marqo_tpu.api.app import generate_config, on_start\n"
            "from marqo_tpu.api.models.index_settings import IndexSettings\n"
            "from marqo_tpu.core.models.add_docs_params import AddDocsParams\n"
            "from marqo_tpu.tensor_search import tensor_search\n"
            "config = generate_config(); on_start(config)\n"
            "config.index_management.create_index(\n"
            "    IndexSettings(model='random').to_marqo_index('walidx'))\n"
            "config.index_meta_cache.populate()\n"
            "docs = [{'_id': str(i), 'text': f'doc {i}'} for i in range(12)]\n"
            "r = tensor_search.add_documents(config, AddDocsParams(\n"
            "    index_name='walidx', docs=docs, tensor_fields=['text']))\n"
            "assert r['errors'] is False\n"
            "print('FED', config.engine.doc_count('walidx'))\n"
            "os._exit(0)\n")
        boot_check = (
            "import os, sys\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "os.environ['MARQO_ENGINE_DATA_DIR'] = sys.argv[1]\n"
            "from marqo_tpu.api.app import generate_config, on_start\n"
            "config = generate_config(); on_start(config)\n"
            "n = config.engine.doc_count('walidx')\n"
            "doc = config.engine.get('walidx', '7')\n"
            "assert n == 12, n\n"
            "assert doc and doc['text'] == 'doc 7'\n"
            "print('RECOVERED', n)\n")
        r1 = subprocess.run([sys.executable, "-c", boot_feed,
                             str(tmp_path)], capture_output=True,
                            text=True, timeout=180, cwd="/root/repo")
        assert "FED 12" in r1.stdout, r1.stderr[-1500:]
        # the crash happened before any snapshot tick
        snaps = [f for f in os.listdir(tmp_path / "engine_data")
                 if f.endswith(".engine.json")]
        assert snaps == []
        r2 = subprocess.run([sys.executable, "-c", boot_check,
                             str(tmp_path)], capture_output=True,
                            text=True, timeout=180, cwd="/root/repo")
        assert "RECOVERED 12" in r2.stdout, r2.stderr[-1500:]


class TestEngineServerDurability:
    def test_setup_engine_durability_cycle(self, tmp_path):
        """The standalone engine server persists like the in-process mode:
        snapshots + WAL via the shared setup_engine_durability()."""
        from marqo_tpu.engine.wal import setup_engine_durability
        eng = StoreEngine(n_shards=2)
        wal = setup_engine_durability(eng, str(tmp_path),
                                      snapshot_interval_s=3600)
        assert wal is not None
        eng.create_index(IndexDescriptor(name="idx", model_dimensions=8))
        for i in range(8):
            _feed(eng, i)
        wal.close()  # crash: the snapshot daemon never ticked

        eng2 = StoreEngine(n_shards=2)
        setup_engine_durability(eng2, str(tmp_path),
                                snapshot_interval_s=3600)
        assert eng2.doc_count("idx") == 8
        assert eng2.get("idx", "d5")["text"] == "doc 5"


class TestWalGenerationBinding:
    def test_stale_wal_quarantined_when_disabled(self, tmp_path,
                                                 monkeypatch):
        """A WAL left by an earlier run must NOT be replayed over newer
        snapshots after an intermediate WAL-disabled run (it would
        resurrect deleted docs)."""
        from marqo_tpu.engine.wal import setup_engine_durability

        # run 1: WAL on; d1 makes it into a snapshot, d2 only into the
        # WAL; crash
        eng = StoreEngine()
        wal = setup_engine_durability(eng, str(tmp_path),
                                      snapshot_interval_s=3600)
        eng.create_index(IndexDescriptor(name="idx", model_dimensions=8))
        _feed(eng, 1)
        eng.snapshot(str(tmp_path / "engine_data"))
        _feed(eng, 2)
        wal.close()

        # run 2: WAL disabled — restores the snapshot, deletes d1,
        # snapshots, exits. The leftover run-1 log is quarantined.
        monkeypatch.setenv("MARQO_ENGINE_WAL", "FALSE")
        eng2 = StoreEngine()
        assert setup_engine_durability(eng2, str(tmp_path),
                                       snapshot_interval_s=3600) is None
        assert eng2.get("idx", "d1") is not None
        eng2.delete("idx", "d1")
        eng2.snapshot(str(tmp_path / "engine_data"))

        # run 3: WAL on again — run-1's stale log must not resurrect d1
        # (or d2, whose ack was forfeited by the WAL-disabled run)
        monkeypatch.delenv("MARQO_ENGINE_WAL")
        eng3 = StoreEngine()
        setup_engine_durability(eng3, str(tmp_path),
                                snapshot_interval_s=3600)
        assert eng3.get("idx", "d1") is None
        assert eng3.get("idx", "d2") is None
        assert os.path.exists(
            str(tmp_path / "engine_data" / "wal.log.stale"))
