"""Native C++ HNSW tests: recall vs brute force, filters, deletes,
save/load."""

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
        for row in x:
            idx.add(row)
        q = x[7]
        ids, dists = idx.search(q, k=1, ef=50)
        assert ids[0] == 7
        assert dists[0] < 1e-5

    def test_recall_at_10(self):
        n, d = 2000, 32
        x = _unit_rows(n, d)
        idx = NativeHnsw(d, m=16, ef_construction=200)
        for row in x:
            idx.add(row)
        queries = _unit_rows(20, d, seed=1)
        sims = queries @ x.T
        recalls = []
        for qi, q in enumerate(queries):
            truth = set(np.argsort(-sims[qi])[:10].tolist())
            ids, _ = idx.search(q, k=10, ef=100)
            recalls.append(len(truth & set(ids.tolist())) / 10)
        assert np.mean(recalls) > 0.95, np.mean(recalls)

    def test_filtered_search(self):
        x = _unit_rows(200, 16)
        idx = NativeHnsw(16, m=8, ef_construction=100)
        for row in x:
            idx.add(row)
        mask = np.zeros(200, dtype=np.uint8)
        mask[100:] = 1  # only the second half allowed
        q = x[3]  # nearest is id 3, but it's filtered out
        ids, _ = idx.search(q, k=5, ef=100, filter_mask=mask)
        assert len(ids) == 5
        assert all(i >= 100 for i in ids)

    def test_delete(self):
        x = _unit_rows(100, 16)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        for row in x:
            idx.add(row)
        assert len(idx) == 100
        idx.remove(5)
        assert len(idx) == 99
        ids, _ = idx.search(x[5], k=3, ef=64)
        assert 5 not in ids

    def test_euclidean_metric(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((100, 8)).astype(np.float32)
        idx = NativeHnsw(8, m=8, ef_construction=64, metric="euclidean")
        for row in x:
            idx.add(row)
        q = x[42]
        ids, dists = idx.search(q, k=1, ef=64)
        assert ids[0] == 42 and dists[0] < 1e-6

    def test_save_load_roundtrip(self):
        x = _unit_rows(300, 16)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        for row in x:
            idx.add(row)
        idx.remove(1)
        blob = idx.save()
        restored = NativeHnsw.load(blob)
        assert len(restored) == 299
        ids, _ = idx.search(x[10], k=5, ef=64)
        ids2, _ = restored.search(x[10], k=5, ef=64)
        np.testing.assert_array_equal(ids, ids2)


class TestParallelBuild:
    """add_batch: the multi-threaded graph build (per-node lock pool)."""

    def test_batch_matches_serial_recall(self):
        n, d = 2000, 32
        x = _unit_rows(n, d)
        idx = NativeHnsw(d, m=16, ef_construction=200)
        first = idx.add_batch(x, n_threads=4)
        assert first == 0 and len(idx) == n
        queries = _unit_rows(20, d, seed=1)
        sims = queries @ x.T
        recalls = []
        for qi, q in enumerate(queries):
            truth = set(np.argsort(-sims[qi])[:10].tolist())
            ids, _ = idx.search(q, k=10, ef=200)
            recalls.append(len(truth & set(ids.tolist())) / 10)
        assert np.mean(recalls) >= 0.95, np.mean(recalls)

    def test_batch_no_self_links_and_exact_hits(self):
        # every vector must find itself at distance ~0 (a self-link bug
        # would strand nodes)
        x = _unit_rows(500, 16, seed=3)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.add_batch(x, n_threads=8)
        for probe in range(0, 500, 37):
            ids, dists = idx.search(x[probe], k=1, ef=64)
            assert ids[0] == probe and dists[0] < 1e-5

    def test_batch_appends_to_existing_graph(self):
        x = _unit_rows(600, 16, seed=4)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        for row in x[:100]:
            idx.add(row)
        first = idx.add_batch(x[100:], n_threads=4)
        assert first == 100 and len(idx) == 600
        ids, dists = idx.search(x[250], k=1, ef=64)
        assert ids[0] == 250 and dists[0] < 1e-5

    def test_batch_save_load_roundtrip(self):
        x = _unit_rows(400, 16, seed=5)
        idx = NativeHnsw(16, m=8, ef_construction=64)
        idx.add_batch(x, n_threads=4)
        idx.remove(3)
        restored = NativeHnsw.load(idx.save())
        assert len(restored) == 399
        ids, _ = restored.search(x[200], k=5, ef=64)
        assert ids[0] == 200

    def test_single_thread_batch(self):
        x = _unit_rows(50, 8, seed=6)
        idx = NativeHnsw(8, m=8, ef_construction=32)
        idx.add_batch(x, n_threads=1)
        ids, _ = idx.search(x[7], k=1, ef=32)
        assert ids[0] == 7
