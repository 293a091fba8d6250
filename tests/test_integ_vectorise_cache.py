"""Ported reference tests: vectorise + inference cache interaction.

Source: /root/reference/tests/core/inference/
test_vectorise_inference_cache.py — single/list string caching, partial
cache only encodes the misses (order and vectors preserved under
shuffle), fully-cached repeats never call the encoder, enable_cache=False
skips, different models don't share entries, string image POINTERS are
cacheable while raw image objects are not, and concurrent access is
safe.
"""

import random
import threading
from unittest import mock

import numpy as np
import pytest

from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.inference_cache import MarqoInferenceCache


@pytest.fixture(autouse=True)
def cache_enabled(monkeypatch):
    inference.clear_loaded_models()
    monkeypatch.setattr(inference, "_inference_cache",
                        MarqoInferenceCache(cache_size=100,
                                            cache_type="LRU"))
    yield
    inference.clear_loaded_models()


def _spy_encode(monkeypatch):
    calls = []
    real = inference._encode

    def spy(model, cache_key, contents, normalize, modality):
        calls.append(list(contents))
        return real(model, cache_key, contents, normalize, modality)

    monkeypatch.setattr(inference, "_encode", spy)
    return calls


class TestVectoriseInferenceCache:
    def test_single_string_cached(self, monkeypatch):
        calls = _spy_encode(monkeypatch)
        v1 = inference.vectorise("random", ["test"], device="cpu",
                                 enable_cache=True)
        v2 = inference.vectorise("random", ["test"], device="cpu",
                                 enable_cache=True)
        assert v1 == v2
        assert len(calls) == 1  # second call fully served from cache

    def test_list_of_strings_cached(self, monkeypatch):
        calls = _spy_encode(monkeypatch)
        content = ["test1", "test2"]
        v1 = inference.vectorise("random", content, device="cpu",
                                 enable_cache=True)
        v2 = inference.vectorise("random", content, device="cpu",
                                 enable_cache=True)
        assert v1 == v2
        assert len(calls) == 1

    def test_enable_cache_false_skips(self, monkeypatch):
        calls = _spy_encode(monkeypatch)
        inference.vectorise("random", ["test"], device="cpu",
                            enable_cache=False)
        inference.vectorise("random", ["test"], device="cpu",
                            enable_cache=False)
        assert len(calls) == 2

    def test_partial_cache_encodes_only_misses(self, monkeypatch):
        calls = _spy_encode(monkeypatch)
        inference.vectorise("random", ["test1", "test2"], device="cpu",
                            enable_cache=True)
        inference.vectorise("random", ["test1", "test2", "test3", "test4"],
                            device="cpu", enable_cache=True)
        assert calls[-1] == ["test3", "test4"]

    def test_partial_cache_vectors_correct_under_shuffle(self, monkeypatch):
        initial = [f"test{i}" for i in range(20)]
        original = inference.vectorise("random", initial, device="cpu",
                                       enable_cache=True)
        new = [f"test{i}" for i in range(20, 40)]
        content = initial + new
        random.shuffle(content)
        vectors = inference.vectorise("random", content, device="cpu",
                                      enable_cache=True)
        assert len(vectors) == 40
        assert [vectors[content.index(c)] for c in initial] == original
        # fully cached now: the encoder must not be called again
        calls = _spy_encode(monkeypatch)
        random.shuffle(content)
        inference.vectorise("random", content, device="cpu",
                            enable_cache=True)
        assert calls == []

    def test_different_models_do_not_share(self, monkeypatch):
        v1 = inference.vectorise("random", ["same content"], device="cpu",
                                 enable_cache=True)
        v2 = inference.vectorise("random/large", ["same content"],
                                 device="cpu", enable_cache=True)
        assert v1 != v2

    def test_raw_arrays_not_cached(self, monkeypatch):
        """Non-string content (decoded images) is never cached."""
        cache = inference._inference_cache
        img = np.random.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        from marqo_tpu.inference.types import Modality
        inference.vectorise("random", [img], device="cpu",
                            enable_cache=True, modality=Modality.IMAGE)
        assert len(cache) == 0

    def test_concurrent_cache_safety(self):
        # preload so no thread hits the (reference-parity) busy rejection
        # raised when a model load is already in flight
        inference.vectorise("random", ["preload"], device="cpu")
        errors = []

        def worker(seed):
            rng = random.Random(seed)
            try:
                for _ in range(10):
                    content = [f"c{rng.randrange(10)}" for _ in range(4)]
                    out = inference.vectorise("random", content,
                                              device="cpu",
                                              enable_cache=True)
                    assert len(out) == 4
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []

    def test_cached_and_fresh_agree(self):
        v_cached = inference.vectorise("random", ["agree?"], device="cpu",
                                       enable_cache=True)
        v_fresh = inference.vectorise("random", ["agree?"], device="cpu",
                                      enable_cache=False)
        np.testing.assert_allclose(v_cached, v_fresh, atol=1e-6)
