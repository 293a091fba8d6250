"""Native C++ HNSW tests (ABI v2, graph-only over external storage):
recall vs brute force, filters, deletes, save/load, cell dtypes."""

import numpy as np
import pytest

from marqo_tpu.engine.native import NativeHnsw, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine not built")


def _unit_rows(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestNativeHnsw:
    def test_exact_on_small(self):
        x = _unit_rows(50, 16)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.link(x, len(x), n_threads=1)
        q = x[7]
        ids, dists = idx.search(x, q, k=1, ef=50)
        assert ids[0] == 7
        assert dists[0] < 1e-5

    def test_recall_at_10(self):
        n, d = 2000, 32
        x = _unit_rows(n, d)
        idx = NativeHnsw(d, m=16, ef_construction=200)
        idx.link(x, n, n_threads=1)
        queries = _unit_rows(20, d, seed=1)
        sims = queries @ x.T
        recalls = []
        for qi, q in enumerate(queries):
            truth = set(np.argsort(-sims[qi])[:10].tolist())
            ids, _ = idx.search(x, q, k=10, ef=100)
            recalls.append(len(truth & set(ids.tolist())) / 10)
        assert np.mean(recalls) > 0.95, np.mean(recalls)

    def test_filtered_search(self):
        x = _unit_rows(200, 16)
        idx = NativeHnsw(16, m=8, ef_construction=100)
        idx.link(x, len(x), n_threads=1)
        mask = np.zeros(200, dtype=np.uint8)
        mask[100:] = 1  # only the second half allowed
        q = x[3]  # nearest is id 3, but it's filtered out
        ids, _ = idx.search(x, q, k=5, ef=100, filter_mask=mask)
        assert len(ids) == 5
        assert all(i >= 100 for i in ids)

    def test_delete(self):
        x = _unit_rows(100, 16)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.link(x, len(x), n_threads=1)
        assert len(idx) == 100
        idx.remove(5)
        assert len(idx) == 99
        ids, _ = idx.search(x, x[5], k=3, ef=64)
        assert 5 not in ids

    def test_euclidean_metric(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((100, 8)).astype(np.float32)
        idx = NativeHnsw(8, m=8, ef_construction=64, metric="euclidean")
        idx.link(x, len(x), n_threads=1)
        q = x[42]
        ids, dists = idx.search(x, q, k=1, ef=64)
        assert ids[0] == 42 and dists[0] < 1e-6

    def test_angular_metric_non_unit_vectors(self):
        # native angular: 1-cos via the norm cache — scale must not change
        # the ranking (raw vectors stay raw in the shared store)
        rng = np.random.default_rng(7)
        x = rng.standard_normal((300, 16)).astype(np.float32)
        x *= rng.uniform(0.1, 10, size=(300, 1)).astype(np.float32)
        idx = NativeHnsw(16, m=8, ef_construction=128, metric="angular")
        idx.link(x, len(x), n_threads=1)
        q = x[11] * 5.0  # same direction, different magnitude
        ids, dists = idx.search(x, q, k=1, ef=128)
        assert ids[0] == 11 and dists[0] < 1e-5

    def test_save_load_roundtrip(self):
        x = _unit_rows(300, 16)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.link(x, len(x), n_threads=1)
        idx.remove(1)
        blob = idx.save()
        restored = NativeHnsw.load(blob)
        assert len(restored) == 299
        ids, _ = idx.search(x, x[10], k=5, ef=64)
        ids2, _ = restored.search(x, x[10], k=5, ef=64)
        np.testing.assert_array_equal(ids, ids2)

    def test_incremental_link(self):
        # feed path: link() called once per add with a growing n_total
        x = _unit_rows(200, 16, seed=9)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        for n in range(1, 201):
            idx.link(x, n, n_threads=1)
        assert len(idx) == 200
        ids, dists = idx.search(x, x[137], k=1, ef=64)
        assert ids[0] == 137 and dists[0] < 1e-5


class TestBf16Cells:
    """bfloat16 cell storage (Vespa tensor cell-type / vectorNumericType):
    the graph reads uint16 bf16 rows straight out of the caller's store."""

    def _bf16(self, x):
        import ml_dtypes
        return np.ascontiguousarray(x, dtype=ml_dtypes.bfloat16)

    def test_exact_hits_and_recall(self):
        n, d = 2000, 32
        x = _unit_rows(n, d)
        xb = self._bf16(x)
        idx = NativeHnsw(d, m=16, ef_construction=200,
                         cell_dtype="bfloat16")
        idx.link(xb, n, n_threads=1)
        queries = _unit_rows(20, d, seed=1)
        sims = queries @ x.T
        recalls = []
        for qi, q in enumerate(queries):
            truth = set(np.argsort(-sims[qi])[:10].tolist())
            ids, _ = idx.search(xb, q, k=10, ef=100)
            recalls.append(len(truth & set(ids.tolist())) / 10)
        # bf16 has ~3 decimal digits; recall vs fp32 truth stays high
        assert np.mean(recalls) > 0.9, np.mean(recalls)

    def test_self_distance_small(self):
        x = _unit_rows(100, 16, seed=2)
        xb = self._bf16(x)
        idx = NativeHnsw(16, m=8, ef_construction=64, cell_dtype="bfloat16")
        idx.link(xb, len(xb), n_threads=1)
        ids, dists = idx.search(xb, x[13], k=1, ef=64)
        assert ids[0] == 13 and dists[0] < 2e-2  # bf16 rounding

    def test_dtype_mismatch_rejected(self):
        x = _unit_rows(10, 8)
        idx = NativeHnsw(8, cell_dtype="bfloat16")
        with pytest.raises(ValueError, match="does not match"):
            idx.link(x, 10, n_threads=1)  # fp32 store into a bf16 graph

    def test_save_load_keeps_cell_dtype(self):
        x = self._bf16(_unit_rows(100, 16, seed=3))
        idx = NativeHnsw(16, m=8, ef_construction=64, cell_dtype="bfloat16")
        idx.link(x, len(x), n_threads=1)
        restored = NativeHnsw.load(idx.save())
        assert restored.cell_dtype == "bfloat16"
        ids, _ = restored.search(x, np.asarray(x[7], np.float32), k=1, ef=64)
        assert ids[0] == 7


class TestParallelBuild:
    """link(): the multi-threaded graph build (per-node lock pool)."""

    def test_batch_matches_serial_recall(self):
        n, d = 2000, 32
        x = _unit_rows(n, d)
        idx = NativeHnsw(d, m=16, ef_construction=200)
        first = idx.link(x, n, n_threads=4)
        assert first == 0 and len(idx) == n
        queries = _unit_rows(20, d, seed=1)
        sims = queries @ x.T
        recalls = []
        for qi, q in enumerate(queries):
            truth = set(np.argsort(-sims[qi])[:10].tolist())
            ids, _ = idx.search(x, q, k=10, ef=200)
            recalls.append(len(truth & set(ids.tolist())) / 10)
        assert np.mean(recalls) >= 0.95, np.mean(recalls)

    def test_batch_no_self_links_and_exact_hits(self):
        # every vector must find itself at distance ~0 (a self-link bug
        # would strand nodes)
        x = _unit_rows(500, 16, seed=3)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.link(x, len(x), n_threads=8)
        for probe in range(0, 500, 37):
            ids, dists = idx.search(x, x[probe], k=1, ef=64)
            assert ids[0] == probe and dists[0] < 1e-5

    def test_batch_appends_to_existing_graph(self):
        x = _unit_rows(600, 16, seed=4)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.link(x, 100, n_threads=1)
        first = idx.link(x, 600, n_threads=4)
        assert first == 100 and len(idx) == 600
        ids, dists = idx.search(x, x[250], k=1, ef=64)
        assert ids[0] == 250 and dists[0] < 1e-5

    def test_batch_save_load_roundtrip(self):
        x = _unit_rows(400, 16, seed=5)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.link(x, len(x), n_threads=4)
        idx.remove(3)
        restored = NativeHnsw.load(idx.save())
        assert len(restored) == 399
        ids, _ = restored.search(x, x[200], k=5, ef=64)
        assert ids[0] == 200

    def test_single_thread_batch(self):
        x = _unit_rows(50, 8, seed=6)
        idx = NativeHnsw(8, m=8, ef_construction=32)
        idx.link(x, len(x), n_threads=1)
        ids, _ = idx.search(x, x[7], k=1, ef=32)
        assert ids[0] == 7
