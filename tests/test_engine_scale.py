"""Engine scale test: 200k vectors through the production store path
(round-5 VERDICT item 1's in-suite leg; the 1M × 768 profile lives in
perf_tests/engine_bench.py + BENCH_NOTES).

Reduced dimensionality keeps the single-core suite runtime bounded while
still exercising every at-scale mechanism: bulk parallel graph build over
the single-copy store, growth reallocation across ~12 capacity doublings,
HNSW recall vs brute force, filtered traversal, tombstones, and the
graph-blob + vector snapshot round trip.
"""

import time

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import (IndexDescriptor,
                                         TensorFieldDescriptor)
from marqo_tpu.engine.native import NativeHnsw, native_available
from marqo_tpu.engine.store import StoreEngine, np_cell_dtype

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not native_available(),
                       reason="native engine not built"),
]

N = 200_000
DIM = 64


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((N // 250, DIM)).astype(np.float32) * 3
    data = centers[rng.integers(0, len(centers), N)] + \
        rng.standard_normal((N, DIM)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = centers[rng.integers(0, len(centers), 50)] + \
        rng.standard_normal((50, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return data, queries


class TestHnsw200k:
    @pytest.fixture(scope="class")
    def index_and_store(self, corpus):
        data, _ = corpus
        idx = NativeHnsw(DIM, m=16, ef_construction=100)
        start = time.perf_counter()
        idx.link(data, N, n_threads=1)
        build_s = time.perf_counter() - start
        return idx, data, build_s

    def test_build_completes_and_counts(self, index_and_store):
        idx, data, build_s = index_and_store
        assert len(idx) == N
        # sanity ceiling only (CI hardware varies; 1-core measured ~60-90s)
        assert build_s < 900, f"build took {build_s:.0f}s"

    def test_recall_at_10(self, index_and_store, corpus):
        idx, data, _ = index_and_store
        _, queries = corpus
        recalls = []
        for q in queries:
            truth = set(np.argsort(-(data @ q))[:10].tolist())
            ids, _ = idx.search(data, q, k=10, ef=100)
            recalls.append(len(truth & set(ids.tolist())) / 10)
        assert np.mean(recalls) >= 0.95, np.mean(recalls)

    def test_filtered_search_at_scale(self, index_and_store, corpus):
        idx, data, _ = index_and_store
        _, queries = corpus
        mask = np.zeros(N, dtype=np.uint8)
        mask[::10] = 1  # 10% allowed
        ids, _ = idx.search(data, queries[0], k=10, ef=200,
                            filter_mask=mask)
        assert len(ids) == 10
        assert all(i % 10 == 0 for i in ids)

    def test_tombstones_at_scale(self, index_and_store, corpus):
        idx, data, _ = index_and_store
        ids, _ = idx.search(data, data[12345], k=1, ef=100)
        assert ids[0] == 12345
        idx.remove(12345)
        ids, _ = idx.search(data, data[12345], k=3, ef=100)
        assert 12345 not in ids

    def test_graph_blob_roundtrip(self, index_and_store, corpus):
        idx, data, _ = index_and_store
        blob = idx.save()
        # graph-only blob: far smaller than the vectors it indexes
        assert len(blob) < data.nbytes
        restored = NativeHnsw.load(blob)
        q = corpus[1][3]
        np.testing.assert_array_equal(
            idx.search(data, q, k=10, ef=100)[0],
            restored.search(data, q, k=10, ef=100)[0])


class TestStoreEngine200kBf16:
    def test_feed_query_snapshot_at_scale(self, corpus, tmp_path):
        """The full store path at 200k vectors with bfloat16 cells: feed in
        chunked docs, HNSW query, snapshot + restore."""
        data, queries = corpus
        eng = StoreEngine()
        eng.create_index(IndexDescriptor(
            name="scale", model_dimensions=DIM, cell_dtype="bfloat16",
            tensor_fields=[TensorFieldDescriptor(
                name="v", dimensions=DIM,
                distance_metric="prenormalized-angular",
                hnsw_ef_construction=100)]))
        chunk = 100  # 100 chunks per doc → 2k docs, 200k vectors
        for d in range(N // chunk):
            lo = d * chunk
            eng.feed("scale", f"d{d}", {"n": d},
                     {"v": {"chunks": [f"c{i}" for i in range(chunk)],
                            "embeddings": data[lo:lo + chunk]}})
        assert eng.vector_count("scale") == N
        ts = eng._indexes["scale"][0].tensors["v"]
        assert ts.matrix()[0].dtype == np_cell_dtype("bfloat16")

        res = eng.query_tensor("scale", queries[0], limit=5,
                               approximate=True)
        assert len(res.hits) == 5
        truth_row = int(np.argmax(data @ queries[0]))
        assert res.hits[0].doc_id == f"d{truth_row // chunk}"

        eng.snapshot(str(tmp_path))
        fresh = StoreEngine()
        fresh.restore(str(tmp_path))
        assert fresh.vector_count("scale") == N
        res2 = fresh.query_tensor("scale", queries[0], limit=5,
                                  approximate=True)
        assert res2.hits[0].doc_id == res.hits[0].doc_id
