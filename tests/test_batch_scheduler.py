"""Dynamic micro-batching scheduler tests."""

import threading
import time

import numpy as np
import pytest

from marqo_tpu.inference.batch_scheduler import (BatchScheduler,
                                                 clear_schedulers,
                                                 get_scheduler)


class TestBatchScheduler:
    def test_single_request(self):
        calls = []

        def encode(contents):
            calls.append(len(contents))
            return np.arange(len(contents), dtype=np.float32)[:, None]

        sched = BatchScheduler(encode, max_wait_ms=1.0)
        out = sched.encode(["a", "b"])
        assert out.shape == (2, 1)
        sched.shutdown()

    def test_concurrent_requests_coalesced(self):
        batch_sizes = []
        release = threading.Event()

        def encode(contents):
            batch_sizes.append(len(contents))
            return np.array([[float(len(str(c)))] for c in contents])

        sched = BatchScheduler(encode, max_wait_ms=30.0, max_batch=100)
        results = {}

        def worker(name, items):
            results[name] = sched.encode(items)

        threads = [threading.Thread(target=worker, args=(f"t{i}",
                                                         [f"item{i}-{j}"
                                                          for j in range(3)]))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # all 15 items should have been coalesced into very few batches
        assert sum(batch_sizes) == 15
        assert len(batch_sizes) <= 3
        # scatter correctness: each request got its own rows
        for i in range(5):
            expected = [[float(len(f"item{i}-{j}"))] for j in range(3)]
            np.testing.assert_allclose(results[f"t{i}"], expected)
        sched.shutdown()

    def test_max_batch_fires_immediately(self):
        fired_at = []

        def encode(contents):
            fired_at.append(time.perf_counter())
            return np.zeros((len(contents), 1), dtype=np.float32)

        sched = BatchScheduler(encode, max_wait_ms=5000.0, max_batch=4)
        start = time.perf_counter()
        out = sched.encode(["a", "b", "c", "d"])  # hits max_batch
        elapsed = time.perf_counter() - start
        assert elapsed < 2.0  # did not wait the full 5s window
        assert out.shape == (4, 1)
        sched.shutdown()

    def test_error_propagates(self):
        def encode(contents):
            raise ValueError("boom")

        sched = BatchScheduler(encode, max_wait_ms=1.0)
        with pytest.raises(ValueError, match="boom"):
            sched.encode(["x"])
        sched.shutdown()

    def test_registry(self):
        def encode(contents):
            return np.zeros((len(contents), 1), dtype=np.float32)

        s1 = get_scheduler("m1", encode)
        s2 = get_scheduler("m1", encode)
        assert s1 is s2
        clear_schedulers()


class TestVectoriseIntegration:
    def test_concurrent_vectorise_coalesced(self, monkeypatch):
        import threading
        import numpy as np
        from marqo_tpu.inference import vectorise as v
        from marqo_tpu.inference import batch_scheduler as bs
        monkeypatch.setenv("MARQO_DYNAMIC_BATCHING", "TRUE")
        v.clear_loaded_models()
        bs.clear_schedulers()
        # load the model once up front (avoids busy-rejection 429s)
        baseline = v.vectorise("test", ["warm up"])
        results = {}
        errors = []

        def worker(i):
            try:
                results[i] = v.vectorise("test", [f"sentence number {i}"])
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == [], errors
        assert len(results) == 12
        # each result must equal the unbatched encode of the same content
        for i in (0, 5, 11):
            direct = v.vectorise("test", [f"sentence number {i}"])
            cos = float(np.dot(results[i][0], direct[0]))
            assert cos > 1 - 1e-3, (i, cos)
        bs.clear_schedulers()
        v.clear_loaded_models()
