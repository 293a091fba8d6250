"""Concurrency stress: parallel add/search/delete against one index must
stay consistent (engine shard locks; reference safety-by-construction,
SURVEY.md §5 race detection)."""

import threading

import numpy as np
import pytest

from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import StoreEngine


class TestEngineConcurrency:
    def test_parallel_feed_search_delete(self):
        eng = StoreEngine(n_shards=2)
        eng.create_index(IndexDescriptor(name="c", model_dimensions=8))
        rng = np.random.default_rng(0)
        vectors = rng.standard_normal((200, 8)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        errors = []

        def feeder(start):
            try:
                for i in range(start, 200, 4):
                    eng.feed("c", f"d{i}", {"n": i, "text": f"doc {i}"},
                             {"v": {"chunks": [f"c{i}"],
                                    "embeddings": [vectors[i]]}})
            except Exception as e:
                errors.append(("feed", e))

        def searcher():
            try:
                for _ in range(40):
                    res = eng.query_tensor("c", vectors[0], limit=5)
                    scores = [h.score for h in res.hits]
                    assert scores == sorted(scores, reverse=True)
                    eng.query_lexical("c", ["doc"], [], limit=5)
            except Exception as e:
                errors.append(("search", e))

        def deleter():
            try:
                for i in range(0, 200, 10):
                    eng.delete("c", f"d{i}")
            except Exception as e:
                errors.append(("delete", e))

        threads = ([threading.Thread(target=feeder, args=(s,))
                    for s in range(4)] +
                   [threading.Thread(target=searcher) for _ in range(2)] +
                   [threading.Thread(target=deleter)])
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == [], errors
        # final state: all docs present except deleted ones not re-fed after
        count = eng.doc_count("c")
        assert 150 <= count <= 200
        # integrity: every remaining doc retrievable and scored
        res = eng.query_tensor("c", vectors[1], limit=200,
                               approximate=False)
        assert len(res.hits) == count

    def test_vectorise_model_cache_thread_safety(self):
        from marqo_tpu.inference import vectorise as v
        v.clear_loaded_models()
        errors = []

        def worker(i):
            try:
                out = v.vectorise("random/small", [f"content {i}"])
                assert len(out[0]) == 32
            except Exception as e:
                # busy-rejection (409) is acceptable behavior under load
                from marqo_tpu.api.exceptions import ModelCacheManagementError
                if not isinstance(e, ModelCacheManagementError):
                    errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == [], errors
        v.clear_loaded_models()


class TestSnapshotUnderLoad:
    def test_snapshots_taken_during_mutation_always_restore(self, tmp_path):
        """Feed/delete continuously while snapshotting in a loop: every
        snapshot written must restore into a consistent engine (docs and
        their tensors agree — the per-shard single-lock capture + paired
        snapshot-id guarantee)."""
        import threading
        import numpy as np
        from marqo_tpu.engine.descriptor import IndexDescriptor
        from marqo_tpu.engine.store import StoreEngine

        eng = StoreEngine(n_shards=2)
        eng.create_index(IndexDescriptor(name="load", model_dimensions=4))
        stop = threading.Event()
        rng = np.random.default_rng(0)

        def mutate():
            i = 0
            while not stop.is_set():
                doc_id = f"d{i % 40}"
                if i % 7 == 3:
                    eng.delete("load", doc_id)
                else:
                    v = rng.standard_normal(4).astype(np.float32)
                    v /= np.linalg.norm(v)
                    eng.feed("load", doc_id, {"n": i},
                             {"t": {"chunks": [f"c{i}"],
                                    "embeddings": [v.tolist()]}})
                i += 1

        threads = [threading.Thread(target=mutate) for _ in range(3)]
        for t in threads:
            t.start()
        try:
            for round_i in range(8):
                directory = tmp_path / f"snap{round_i}"
                eng.snapshot(str(directory))
                fresh = StoreEngine(n_shards=2)
                restored = fresh.restore(str(directory))
                assert restored == fresh.doc_count("load")
                # consistency: every live doc's tensors are retrievable and
                # belong to it; no tensors for absent docs
                for doc_id, _fields in fresh.visit_all("load"):
                    tensors = fresh.get_tensors("load", doc_id)
                    assert isinstance(tensors, dict)
                for shard in fresh._shards("load"):
                    with shard.lock:
                        live = set(shard.docs)
                        for ts in shard.tensors.values():
                            for d in ts._live_docs:
                                assert d in live, \
                                    f"tensor rows for absent doc {d}"
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=10)
