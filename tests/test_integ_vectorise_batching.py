"""Port: media-download thread count + vectorise batching suites.

Sources:
- /root/reference/tests/tensor_search/test_media_download_thread_count.py
  (all 20 functions — the _determine_thread_count precedence chain,
  add_docs.py:255-287)
- /root/reference/tests/s2_inference/test_vectorise.py (12 functions —
  MARQO_MAX_VECTORISE_BATCH_SIZE chunking/validation, empty content,
  VectoriseError wrapping, device requirement)

Harness rewritten for marqo_tpu (tensor_search.add_docs +
inference.vectorise). Mock-call-count assertions target our model.encode.
"""

import os
import unittest
from unittest import mock
from unittest.mock import MagicMock, patch

import numpy as np
import pytest

from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search.add_docs import _determine_thread_count

MEDIA_ENV = "MARQO_MEDIA_DOWNLOAD_THREAD_COUNT_PER_REQUEST"
IMAGE_ENV = "MARQO_IMAGE_DOWNLOAD_THREAD_COUNT_PER_REQUEST"


class MarqoIndex:
    def __init__(self, model_type):
        self.model = MagicMock()
        self.model.get_properties.return_value = {"type": model_type}


class AddDocsParams:
    def __init__(self, media_download_thread_count=None,
                 image_download_thread_count=None):
        self.media_download_thread_count = media_download_thread_count
        self.image_download_thread_count = image_download_thread_count


class TestDetermineThreadCount(unittest.TestCase):
    """reference test_media_download_thread_count.py — all 20 cases"""

    def setUp(self):
        self.env_patcher = patch.dict(os.environ, {}, clear=True)
        self.env_patcher.start()

    def tearDown(self):
        self.env_patcher.stop()

    def test_defaults_with_non_languagebind_model(self):
        assert _determine_thread_count(MarqoIndex("other"),
                                       AddDocsParams()) == 20

    def test_defaults_with_languagebind_model(self):
        assert _determine_thread_count(MarqoIndex("languagebind"),
                                       AddDocsParams()) == 5

    def test_media_thread_count_set_in_params(self):
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(media_download_thread_count=10)) == 10

    def test_media_thread_count_set_in_env(self):
        os.environ[MEDIA_ENV] = "15"
        assert _determine_thread_count(MarqoIndex("other"),
                                       AddDocsParams()) == 15

    def test_image_thread_count_set_in_params(self):
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(image_download_thread_count=25)) == 25

    def test_image_thread_count_set_in_env(self):
        os.environ[IMAGE_ENV] = "30"
        assert _determine_thread_count(MarqoIndex("other"),
                                       AddDocsParams()) == 30

    def test_media_thread_count_default_in_params(self):
        """media == default 5 in params is treated as unset; image default
        returned."""
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(media_download_thread_count=5)) == 20

    def test_media_thread_count_default_in_env(self):
        os.environ[MEDIA_ENV] = "5"
        assert _determine_thread_count(MarqoIndex("other"),
                                       AddDocsParams()) == 20

    def test_image_thread_count_default_in_params(self):
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(image_download_thread_count=20)) == 20

    def test_image_thread_count_default_in_env(self):
        os.environ[IMAGE_ENV] = "20"
        assert _determine_thread_count(MarqoIndex("other"),
                                       AddDocsParams()) == 20

    def test_languagebind_with_media_thread_count_in_params(self):
        assert _determine_thread_count(
            MarqoIndex("languagebind"),
            AddDocsParams(media_download_thread_count=10)) == 10

    def test_languagebind_with_media_thread_count_in_env(self):
        os.environ[MEDIA_ENV] = "15"
        assert _determine_thread_count(MarqoIndex("languagebind"),
                                       AddDocsParams()) == 15

    def test_languagebind_ignores_image_thread_count_in_params(self):
        """languagebind takes precedence over the image-count param."""
        assert _determine_thread_count(
            MarqoIndex("languagebind"),
            AddDocsParams(image_download_thread_count=25)) == 5

    def test_languagebind_ignores_image_thread_count_in_env(self):
        os.environ[IMAGE_ENV] = "30"
        assert _determine_thread_count(MarqoIndex("languagebind"),
                                       AddDocsParams()) == 5

    def test_media_params_precedence_over_env(self):
        os.environ[MEDIA_ENV] = "15"
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(media_download_thread_count=10)) == 10

    def test_image_params_precedence_over_env(self):
        os.environ[IMAGE_ENV] = "30"
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(image_download_thread_count=25)) == 25

    def test_media_env_precedence_over_image_params(self):
        os.environ[MEDIA_ENV] = "15"
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(image_download_thread_count=25)) == 15

    def test_media_params_precedence_over_image_env(self):
        os.environ[IMAGE_ENV] = "30"
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(media_download_thread_count=10)) == 10

    def test_both_params_set_media_wins(self):
        assert _determine_thread_count(
            MarqoIndex("other"),
            AddDocsParams(media_download_thread_count=10,
                          image_download_thread_count=25)) == 10

    def test_both_envs_set_media_wins(self):
        os.environ[MEDIA_ENV] = "15"
        os.environ[IMAGE_ENV] = "30"
        assert _determine_thread_count(MarqoIndex("other"),
                                       AddDocsParams()) == 15


def _install_mock_model(monkeypatch, dims=128):
    """Register a mock model in the loaded-model cache so vectorise skips
    loading (the reference patches _available_models the same way)."""
    calls = []

    class _MockModel:
        loaded = True
        dimensions = dims

        def encode(self, contents, normalize=True, modality=None):
            calls.append(list(contents))
            # deterministic per-CONTENT vectors (like the reference's
            # Random model) so chunked and unchunked runs are comparable
            rows = []
            for item in contents:
                seed = abs(hash(str(item))) % (2 ** 32)
                rng = np.random.default_rng(seed)
                rows.append(rng.standard_normal(dims).astype(np.float32))
            out = np.stack(rows)
            if normalize:
                out /= np.linalg.norm(out, axis=-1, keepdims=True)
            return out

        def encode_async(self, contents, normalize=True, modality=None):
            result = self.encode(contents, normalize=normalize,
                                 modality=modality)
            return lambda: result

    model = _MockModel()
    monkeypatch.setattr(inference, "_update_available_models",
                        lambda *a, **k: model)
    return model, calls


class TestVectoriseBatching:
    """reference test_vectorise.py — all 12 behaviors"""

    PROPS = {"name": "mock_model", "dimensions": 128, "tokens": 128,
             "type": "sbert"}

    def test_vectorise_in_batches(self, monkeypatch):
        _, calls = _install_mock_model(monkeypatch)
        out = inference.vectorise(model_name="mock_model",
                                  content=["just a single content"],
                                  model_properties=self.PROPS, device="cpu")
        assert len(out) == 1 and len(out[0]) == 128
        assert len(calls) == 1

    def test_vectorise_empty_content(self, monkeypatch):
        from marqo_tpu.core.exceptions import VectoriseError
        _install_mock_model(monkeypatch)
        for empty in ([], None):
            with pytest.raises(VectoriseError, match="empty"):
                inference.vectorise(model_name="mock_model", content=empty,
                                    model_properties=self.PROPS,
                                    device="cpu")

    def test_vectorise_in_batches_with_different_batch_sizes(self,
                                                             monkeypatch):
        contents = [f"content {i}" for i in range(10)]
        for batch_size, expected_calls in [(1, 10), (3, 4), (5, 2),
                                           (10, 1), (16, 1)]:
            _, calls = _install_mock_model(monkeypatch)
            monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE",
                               str(batch_size))
            out = inference.vectorise(model_name="mock_model",
                                      content=contents,
                                      model_properties=self.PROPS,
                                      device="cpu")
            assert len(out) == 10
            assert len(calls) == expected_calls, batch_size
            assert all(len(c) <= batch_size for c in calls)

    def test_vectorise_chunking_preserves_order(self, monkeypatch):
        """chunked and unchunked runs produce identical vectors in order
        (the reference concatenates vector_batches, s2_inference:134-150)
        """
        contents = [f"content {i}" for i in range(7)]
        _, _ = _install_mock_model(monkeypatch)
        base = inference.vectorise(model_name="mock_model",
                                   content=contents,
                                   model_properties=self.PROPS,
                                   device="cpu")
        monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE", "2")
        chunked = inference.vectorise(model_name="mock_model",
                                      content=contents,
                                      model_properties=self.PROPS,
                                      device="cpu")
        assert np.allclose(base, chunked)

    def test_vectorise_single_content_item(self, monkeypatch):
        _, calls = _install_mock_model(monkeypatch)
        out = inference.vectorise(model_name="mock_model",
                                  content="single string",
                                  model_properties=self.PROPS, device="cpu")
        assert len(out) == 1
        assert calls == [["single string"]]

    def test_vectorise_batch_size_one(self, monkeypatch):
        contents = ["a", "b", "c"]
        _, calls = _install_mock_model(monkeypatch)
        monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE", "1")
        inference.vectorise(model_name="mock_model", content=contents,
                            model_properties=self.PROPS, device="cpu")
        assert calls == [["a"], ["b"], ["c"]]

    def test_vectorise_error_handling(self, monkeypatch):
        import PIL

        from marqo_tpu.core.exceptions import VectoriseError
        model, _ = _install_mock_model(monkeypatch)

        def boom(*a, **k):
            raise PIL.UnidentifiedImageError("Some error")

        model.encode = boom
        with pytest.raises(VectoriseError):
            inference.vectorise(model_name="mock_model", content=["x"],
                                model_properties=self.PROPS, device="cpu")

    def test_get_max_vectorise_batch_size(self, monkeypatch):
        for value, expected in [(1, 1), ("1", 1), ("100", 100), (10, 10)]:
            monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE", str(value))
            assert inference._get_max_vectorise_batch_size() == expected

    def test_get_max_vectorise_batch_size_invalid(self, monkeypatch):
        from marqo_tpu.api.exceptions import EnvVarError
        for bad in ["0", "1.2", "dinosaur", "-1", "-4"]:
            monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE", bad)
            with pytest.raises(EnvVarError):
                inference._get_max_vectorise_batch_size()

    def test_vectorise_device_defaulting(self, monkeypatch):
        """The reference requires an explicit device (InternalError when
        missing, test_vectorise.py:324-337) because its device is chosen
        per-request. marqo_tpu targets one accelerator type, so device
        defaults to the configured best device — vectorise must succeed.
        (Adapted divergence; logged in PARITY.md.)"""
        _, calls = _install_mock_model(monkeypatch)
        out = inference.vectorise(model_name="mock_model", content=["x"],
                                  model_properties=self.PROPS)
        assert len(out) == 1


class TestConcurrentVectorise:
    """reference test_automatic_model_ejection_and_concurrency.py:172-255.

    Adapted divergence (PARITY.md): when several threads need a model
    that is still loading, the reference's non-blocking race check raises
    ModelCacheManagementError (409) at the racing callers, exactly like
    the reference (_update_available_models, s2_inference.py:293-298).
    """

    def test_concurrent_vectorise_call_no_cache(self, monkeypatch):
        """Racing loads: exactly like the reference, the caller holding
        the load lock succeeds and concurrent callers needing a (still
        loading) model are rejected with ModelCacheManagementError (409)
        (reference _update_available_models, s2_inference.py:286-337)."""
        import queue
        import threading
        import time as _time

        from marqo_tpu.api.exceptions import ModelCacheManagementError
        inference.clear_loaded_models()
        real_load = inference.load_model
        started = threading.Event()

        def slow_load(*args, **kwargs):
            started.set()
            _time.sleep(1.0)
            return real_load(*args, **kwargs)

        monkeypatch.setattr(inference, "load_model", slow_load)
        q_main, q_race = queue.Queue(), queue.Queue()

        def main_call():
            try:
                inference.vectorise(model_name="test",
                                    content="this is a test", device="cpu")
                q_main.put("success")
            except Exception as e:  # pragma: no cover
                q_main.put(e)

        def racing_call():
            try:
                inference.vectorise(model_name="test",
                                    content="this is a test", device="cpu")
                q_race.put("raced-through")
            except ModelCacheManagementError as e:
                q_race.put(e)

        t = threading.Thread(target=main_call)
        t.start()
        started.wait(timeout=5)
        racers = [threading.Thread(target=racing_call) for _ in range(3)]
        for r in racers:
            r.start()
        for r in racers:
            r.join()
        t.join()
        assert q_main.get() == "success"
        results = [q_race.get() for _ in range(3)]
        assert all(isinstance(r, ModelCacheManagementError) for r in results), \
            results

    def test_concurrent_vectorise_call_cached(self):
        import queue
        import threading
        inference.clear_loaded_models()
        inference.vectorise(model_name="test", content="warm", device="cpu")
        q = queue.Queue()

        def call():
            try:
                inference.vectorise(model_name="test",
                                    content="this is a test", device="cpu")
                q.put("success")
            except Exception as e:  # pragma: no cover
                q.put(e)

        threads = [threading.Thread(target=call) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert [q.get() for _ in range(3)] == ["success"] * 3

    def test_concurrent_model_loading_and_vectorise(self):
        import queue
        import threading
        inference.clear_loaded_models()
        inference.vectorise(model_name="test", content="warm", device="cpu")
        q = queue.Queue()

        def call(model):
            try:
                inference.vectorise(model_name=model,
                                    content="this is a test", device="cpu")
                q.put("success")
            except Exception as e:  # pragma: no cover
                q.put(e)

        # thread 1 loads a NEW model while thread 2 uses the cached one
        t1 = threading.Thread(target=call, args=("random",))
        t2 = threading.Thread(target=call, args=("test",))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert [q.get() for _ in range(2)] == ["success"] * 2
        inference.clear_loaded_models()
