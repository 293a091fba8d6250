"""Regression tests for the round-1 advisor findings: stable shard routing
across process restarts, torn/corrupt snapshot degradation, shard-count
changes between snapshot and restore, angular-metric ranking consistency,
and scheduler invalidation on model eviction."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.store import StoreEngine


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return (v / np.linalg.norm(v)).tolist()


class TestStableShardRouting:
    def test_routing_is_hashseed_independent(self):
        """Doc→shard routing must not depend on Python's per-process hash
        salt: snapshots persist tensors by shard index, so a restart with a
        different PYTHONHASHSEED must route every doc to the same shard."""
        doc_ids = [f"doc-{i}" for i in range(40)] + ["", "ünïcode-Ω", "a b/c"]
        script = (
            "import json,sys; sys.path.insert(0, %r);"
            "from marqo_tpu.engine.descriptor import IndexDescriptor;"
            "from marqo_tpu.engine.store import StoreEngine;"
            "e=StoreEngine(n_shards=5);"
            "e.create_index(IndexDescriptor(name='r', model_dimensions=4));"
            "ids=json.loads(sys.stdin.read());"
            "print(json.dumps([e._shards('r').index(e._shard_for('r', d))"
            " for d in ids]))"
            % os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        routes = []
        for seed in ("1", "2"):
            env = dict(os.environ, PYTHONHASHSEED=seed, JAX_PLATFORMS="cpu")
            out = subprocess.run([sys.executable, "-c", script],
                                 input=json.dumps(doc_ids), text=True,
                                 capture_output=True, env=env, timeout=120)
            assert out.returncode == 0, out.stderr
            routes.append(json.loads(out.stdout.strip().splitlines()[-1]))
        assert routes[0] == routes[1]
        assert len(set(routes[0])) > 1  # actually spreads across shards

    def test_sharded_restore_delete_leaves_no_stale_tensors(self, tmp_path):
        """The advisor's observed failure: with n_shards>1, restore into a
        new process misrouted tensors, then delete() left stale tensor rows
        still returned by tensor search."""
        eng = StoreEngine(n_shards=4)
        eng.create_index(IndexDescriptor(name="s", model_dimensions=4))
        n = 20
        for i in range(n):
            v = [0.0] * 4
            v[i % 4] = 1.0
            eng.feed("s", f"d{i}", {"n": i},
                     {"t": {"chunks": [f"c{i}"], "embeddings": [v]}})
        eng.snapshot(str(tmp_path))

        fresh = StoreEngine(n_shards=4)
        fresh.restore(str(tmp_path))
        # every doc's tensors must be retrievable and co-located with it
        for i in range(n):
            res = fresh.query_tensor("s", _unit([1 if j == i % 4 else 0.001
                                                 for j in range(4)]),
                                     limit=n, approximate=False)
            assert f"d{i}" in [h.doc_id for h in res.hits]
        fresh.delete("s", "d3")
        res = fresh.query_tensor("s", _unit([0.001, 0.001, 0.001, 1]),
                                 limit=n, approximate=False)
        assert "d3" not in [h.doc_id for h in res.hits]
        assert fresh.get("s", "d3") is None

    def test_restore_with_changed_shard_count(self, tmp_path):
        """Changing MARQO_ENGINE_SHARDS between runs re-routes tensor rows
        per document instead of installing them at stale shard indexes."""
        eng = StoreEngine(n_shards=3)
        eng.create_index(IndexDescriptor(name="c", model_dimensions=4))
        for i in range(12):
            v = [0.0] * 4
            v[i % 4] = 1.0
            eng.feed("c", f"d{i}", {"n": i},
                     {"t": {"chunks": [f"c{i}"], "embeddings": [v]}})
        eng.snapshot(str(tmp_path))

        fresh = StoreEngine(n_shards=2)
        fresh.restore(str(tmp_path))
        assert fresh.doc_count("c") == 12
        assert fresh.vector_count("c") == 12
        fresh.delete("c", "d5")
        assert fresh.vector_count("c") == 11
        res = fresh.query_tensor("c", _unit([0.001, 1, 0.001, 0.001]),
                                 limit=12, approximate=False)
        assert "d5" not in [h.doc_id for h in res.hits]
        assert "d1" in [h.doc_id for h in res.hits]


class TestSnapshotCorruption:
    def _seed(self, tmp_path):
        eng = StoreEngine()
        for name in ("good", "bad"):
            eng.create_index(IndexDescriptor(name=name, model_dimensions=4))
            eng.feed(name, "x", {"title": "hello"},
                     {"title": {"chunks": ["hello"],
                                "embeddings": [_unit([1, 0, 0, 0])]}})
        eng.snapshot(str(tmp_path))
        return eng

    def test_torn_pair_restores_docs_only(self, tmp_path):
        """JSON/npz snapshot-id mismatch (crash between the two renames):
        docs restore, tensors are dropped with a warning, and the other
        index restores fully."""
        self._seed(tmp_path)
        path = tmp_path / "bad.engine.json"
        payload = json.loads(path.read_text())
        payload["snapshot_id"] = "0" * 32
        path.write_text(json.dumps(payload))

        fresh = StoreEngine()
        restored = fresh.restore(str(tmp_path))
        assert restored == 2
        assert fresh.get("bad", "x")["title"] == "hello"
        assert fresh.vector_count("bad") == 0  # tensors dropped, not torn
        assert fresh.vector_count("good") == 1

    def test_corrupt_json_does_not_block_other_indexes(self, tmp_path):
        self._seed(tmp_path)
        (tmp_path / "bad.engine.json").write_text("{ not json")
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        assert not fresh.has_index("bad")
        assert fresh.get("good", "x")["title"] == "hello"
        assert fresh.vector_count("good") == 1

    def test_missing_npz_key_does_not_block_other_indexes(self, tmp_path):
        self._seed(tmp_path)
        # npz with matching id but missing the vectors entry (torn write)
        path = tmp_path / "bad.engine.json"
        payload = json.loads(path.read_text())
        np.savez(str(tmp_path / "bad.tensors.npz"),
                 __snapshot_id__=np.frombuffer(
                     payload["snapshot_id"].encode(), dtype=np.uint8))
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        assert fresh.vector_count("good") == 1  # unaffected
        # 'bad' raised mid-install; its docs (fed before tensors) survive
        assert fresh.get("bad", "x")["title"] == "hello"


class TestCorruptHnswBlob:
    def test_truncated_blob_raises_instead_of_crashing(self):
        from marqo_tpu.engine.native import NativeHnsw, native_available
        if not native_available():
            pytest.skip("native engine not built")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((50, 8)).astype(np.float32)
        idx = NativeHnsw(8, m=4, ef_construction=32)
        idx.link(x, 50, n_threads=1)
        blob = idx.save()
        with pytest.raises(ValueError):
            NativeHnsw.load(blob[: len(blob) // 2])
        with pytest.raises(ValueError):
            NativeHnsw.load(b"\x00" * 10)
        # absurd header values (4B rows) must be rejected, not allocated
        garbage = np.zeros(10, dtype=np.int32)
        garbage[0] = -2  # magic
        garbage[1] = 2   # abi
        garbage[2] = 8   # dim
        garbage[3] = 4   # M
        garbage[7] = 2**31 - 1  # n
        with pytest.raises(ValueError):
            NativeHnsw.load(garbage.tobytes() + b"\x00" * 64)
        # legacy (pre-v2) blobs embed vectors the graph no longer owns —
        # rejected so the store falls back to a lazy rebuild
        legacy = np.zeros(7, dtype=np.int32)
        legacy[0] = 8
        legacy[1] = 4
        with pytest.raises(ValueError):
            NativeHnsw.load(legacy.tobytes() + b"\x00" * 64)
        # intact blob still loads
        assert len(NativeHnsw.load(blob)) == 50


class TestAngularMetricConsistency:
    def test_approximate_matches_exact_on_non_unit_vectors(self):
        """metric='angular' with normalize_embeddings=false: the HNSW path
        (normalized copies) must produce the same ranking and the same
        closeness values as the exact arccos path."""
        from marqo_tpu.engine.native import native_available
        if not native_available():
            pytest.skip("native engine not built")
        rng = np.random.default_rng(7)
        n, d = 1500, 16
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(
            name="ang", model_dimensions=d,
            tensor_fields=[TensorFieldDescriptor(
                name="v", dimensions=d, distance_metric="angular")]))
        # wildly non-unit norms so prenormalized vs true-angle ordering differ
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs *= rng.uniform(0.1, 50.0, size=(n, 1)).astype(np.float32)
        for i in range(n):
            eng.feed("ang", f"d{i}", {"n": i},
                     {"v": {"chunks": [f"c{i}"], "embeddings": [vecs[i]]}})
        query = (rng.standard_normal(d) * 13.0).astype(np.float32)
        exact = eng.query_tensor("ang", query, limit=10, approximate=False)
        approx = eng.query_tensor("ang", query, limit=10, approximate=True)
        exact_ids = [h.doc_id for h in exact.hits]
        approx_ids = [h.doc_id for h in approx.hits]
        overlap = len(set(exact_ids) & set(approx_ids))
        assert overlap >= 9, (exact_ids, approx_ids)
        # same closeness definition on both paths (1/(1+angle))
        exact_scores = {h.doc_id: h.score for h in exact.hits}
        for h in approx.hits:
            if h.doc_id in exact_scores:
                assert abs(h.score - exact_scores[h.doc_id]) < 1e-4


class TestSchedulerEviction:
    def test_eject_model_shuts_down_its_scheduler(self, monkeypatch):
        from marqo_tpu.inference import vectorise as v
        from marqo_tpu.inference import batch_scheduler as bs

        monkeypatch.setenv("MARQO_DYNAMIC_BATCHING", "TRUE")
        v.clear_loaded_models()
        v.vectorise("test", ["hello scheduler"], device="cpu")
        assert len(bs._schedulers) == 1
        key = next(iter(bs._schedulers))
        scheduler = bs._schedulers[key]
        v.eject_model("test", "cpu")
        assert key not in bs._schedulers
        assert scheduler._stop.is_set()
        v.clear_loaded_models()

    def test_lru_eviction_shuts_down_scheduler(self, monkeypatch):
        from marqo_tpu.inference import vectorise as v
        from marqo_tpu.inference import batch_scheduler as bs

        monkeypatch.setenv("MARQO_DYNAMIC_BATCHING", "TRUE")
        v.clear_loaded_models()
        v.vectorise("test", ["occupies memory"], device="cpu")
        assert len(bs._schedulers) == 1
        scheduler = next(iter(bs._schedulers.values()))
        # shrink the budget so the next load must evict `test`
        monkeypatch.setenv("MARQO_MAX_CPU_MODEL_MEMORY", "0.4")
        from marqo_tpu.inference.vectorise import Device
        v._evict_lru_until_fits(Device.CPU, 0.4)
        assert bs._schedulers == {}
        assert scheduler._stop.is_set()
        v.clear_loaded_models()
