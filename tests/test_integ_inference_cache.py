"""Ported reference tests: inference cache (LRU/LFU embedding cache).

Source: /root/reference/tests/core/inference/test_inference_cache.py —
type/size init validation, `model||content` key format, set/get/override,
default on miss, LRU and LFU eviction order, concurrent reads/writes,
same-key write races, enablement gating, and clear().
"""

import random
import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from marqo_tpu.exceptions import InvalidArgumentError
from marqo_tpu.inference.inference_cache import MarqoInferenceCache

SIZE = 10


class TestInferenceCacheInit:
    @pytest.mark.parametrize("cache_type", ["LRU", "LFU"])
    def test_init_success(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        assert cache.maxsize == SIZE
        assert cache.currsize == 0
        assert cache.is_enabled()

    @pytest.mark.parametrize("cache_size,cache_type", [
        (10, "INVALID"), (10, 1), (1.4, "LFU"), (-1, "LRU"),
    ])
    def test_init_failure(self, cache_size, cache_type):
        with pytest.raises(InvalidArgumentError):
            MarqoInferenceCache(cache_size=cache_size,
                                cache_type=cache_type)

    @pytest.mark.parametrize("cache_type", ["LRU", "LFU"])
    def test_generate_key(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        assert cache._generate_key("model_cache_key", "content") == \
            "model_cache_key||content"

    def test_size_zero_disables(self):
        cache = MarqoInferenceCache(cache_size=0, cache_type="LRU")
        assert not cache.is_enabled()
        cache.set("k", "c", [1.0])
        assert cache.get("k", "c") is None
        assert len(cache) == 0


@pytest.mark.parametrize("cache_type", ["LRU", "LFU"])
class TestInferenceCacheBehavior:
    def test_set_and_get(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        cache.set("key1", "content1", [1.0])
        assert ("key1", "content1") in cache
        assert cache.get("key1", "content1") == [1.0]

    def test_get_missing(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        assert cache.get("nope", "content") is None
        assert cache.get("nope", "content", default=[2.0]) == [2.0]

    def test_override(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        cache.set("model-cache-key", "content", [1.0])
        cache.set("model-cache-key", "content", [2.0])
        assert cache.get("model-cache-key", "content") == [2.0]

    def test_eviction_policy(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        for i in range(SIZE):
            cache.set("model-cache-key", f"content-{i}", [float(i)])
        if cache_type == "LRU":
            cache.get("model-cache-key", "content-0")  # refresh 0
            evicted = ("model-cache-key", "content-1")
        else:  # LFU: bump everything except the last key
            for i in range(SIZE - 1):
                cache.get("model-cache-key", f"content-{i}")
            evicted = ("model-cache-key", f"content-{SIZE - 1}")
        cache.set("model-cache-key", "new", [100.0])
        assert ("model-cache-key", "new") in cache
        assert evicted not in cache, \
            f"{evicted} was not evicted under {cache_type} policy"

    def test_concurrent_reads(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        cache.set("k", "c", [1.0])
        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(
                lambda _: cache.get("k", "c"), range(100)))
        assert all(r == [1.0] for r in results)

    def test_concurrent_writes(self, cache_type):
        cache = MarqoInferenceCache(cache_size=100, cache_type=cache_type)

        def write(i):
            cache.set("k", f"content-{i % 50}", [float(i)])

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(write, range(500)))
        assert cache.currsize <= 100
        # every surviving entry is intact
        for i in range(50):
            got = cache.get("k", f"content-{i}")
            assert got is None or isinstance(got, list)

    def test_concurrent_writes_to_same_key(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        values = [[float(i)] for i in range(64)]

        def write(v):
            cache.set("k", "same-content", v)

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(write, values))
        assert cache.get("k", "same-content") in values

    def test_read_write_mix_thread_safety(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        errors = []

        def worker(seed):
            rng = random.Random(seed)
            try:
                for _ in range(200):
                    i = rng.randrange(20)
                    if rng.random() < 0.5:
                        cache.set("k", f"c{i}", [float(i)])
                    else:
                        got = cache.get("k", f"c{i}")
                        if got is not None and got != [float(i)]:
                            errors.append((i, got))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []

    def test_clear(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        for i in range(5):
            cache.set("k", f"c{i}", [float(i)])
        assert cache.currsize == 5
        cache.clear()
        assert cache.currsize == 0
        assert cache.get("k", "c0") is None

    def test_non_string_content_not_cached(self, cache_type):
        cache = MarqoInferenceCache(cache_size=SIZE, cache_type=cache_type)
        cache.set("k", ["a", "list"], [1.0])
        assert cache.currsize == 0
