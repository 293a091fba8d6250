"""Concurrent-feed correctness + throughput shape for the engine.

Role parity: Vespa ingests on many feed threads concurrently (the
reference's VespaClient feeds with an async pool of 10,
vespa_client.py:267). The in-process engine must accept concurrent feeds,
deletes, and queries from API worker threads without losing documents,
double-counting, or corrupting per-field tensor stores — including while
a field crosses the HNSW approximate-path threshold mid-traffic.
"""

import threading
import time

import numpy as np

from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import StoreEngine


def _mk_engine(n_shards=2, dims=16):
    eng = StoreEngine(n_shards=n_shards)
    eng.create_index(IndexDescriptor(name="idx", model_dimensions=dims))
    return eng


def _vec(i, dims=16):
    rng = np.random.default_rng(i)
    v = rng.standard_normal(dims).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


class TestConcurrentFeed:
    def test_parallel_feeders_no_loss(self):
        eng = _mk_engine()
        n_threads, per_thread = 8, 120
        errors = []

        def feeder(t):
            try:
                for i in range(per_thread):
                    doc_id = f"t{t}-d{i}"
                    eng.feed("idx", doc_id,
                             {"_id": doc_id, "text": f"doc {t} {i}"},
                             {"text": {"chunks": [f"doc {t} {i}"],
                                       "embeddings": [_vec(t * 1000 + i)]}})
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=feeder, args=(t,))
                   for t in range(n_threads)]
        start = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        elapsed = time.perf_counter() - start
        assert not errors
        total = n_threads * per_thread
        assert eng.doc_count("idx") == total
        assert eng.vector_count("idx") == total
        # throughput sanity on 1 core: well north of 1k feeds/s
        assert total / elapsed > 500, f"{total / elapsed:.0f} feeds/s"
        for t in range(n_threads):
            tensors = eng.get_tensors("idx", f"t{t}-d7")
            assert len(tensors["text"]) == 1

    def test_feed_delete_query_interleaved(self):
        eng = _mk_engine()
        stop = threading.Event()
        errors = []

        def feeder():
            i = 0
            while not stop.is_set():
                doc_id = f"f{i % 300}"
                try:
                    eng.feed("idx", doc_id, {"_id": doc_id, "text": "x"},
                             {"text": {"chunks": ["x"],
                                       "embeddings": [_vec(i)]}})
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                i += 1

        def deleter():
            i = 0
            while not stop.is_set():
                try:
                    eng.delete("idx", f"f{(i * 7) % 300}")
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                i += 1

        def querier():
            q = _vec(999)
            while not stop.is_set():
                try:
                    res = eng.query_tensor("idx", q, limit=5)
                    for h in res.hits:
                        assert h.score == h.score  # not NaN
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        threads = [threading.Thread(target=f)
                   for f in (feeder, feeder, deleter, querier)]
        for th in threads:
            th.start()
        time.sleep(2.0)
        stop.set()
        for th in threads:
            th.join()
        assert not errors
        # engine internally consistent: counts vs visit
        docs = list(eng.visit_all("idx"))
        assert eng.doc_count("idx") == len(docs)

    def test_concurrent_feed_across_hnsw_threshold(self):
        """Feeds pushing a field across the approximate-path threshold
        while queries run must keep search usable and consistent."""
        eng = _mk_engine(n_shards=1)
        for i in range(1000):
            eng.feed("idx", f"p{i}", {"_id": f"p{i}", "text": "x"},
                     {"text": {"chunks": ["x"], "embeddings": [_vec(i)]}})
        errors = []
        stop = threading.Event()

        def feeder():
            try:
                for i in range(1000, 1400):
                    eng.feed("idx", f"p{i}", {"_id": f"p{i}", "text": "x"},
                             {"text": {"chunks": ["x"],
                                       "embeddings": [_vec(i)]}})
            except Exception as e:  # pragma: no cover
                errors.append(e)
            finally:
                stop.set()

        def querier():
            q = _vec(31337)
            while not stop.is_set():
                try:
                    res = eng.query_tensor("idx", q, limit=10,
                                           approximate=True)
                    assert len(res.hits) <= 10
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        threads = [threading.Thread(target=feeder),
                   threading.Thread(target=querier)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors
        assert eng.doc_count("idx") == 1400
        res = eng.query_tensor("idx", _vec(1200), limit=3, approximate=True)
        assert res.hits and res.hits[0].doc_id == "p1200"
