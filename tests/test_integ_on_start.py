"""Ported reference tests: on-start warm-up scripts.

Source: /root/reference/tests/tensor_search/test_on_start_script.py —
MARQO_MODELS_TO_PRELOAD accepts a JSON array of names or custom-model
dicts (malformed JSON → EnvVarError; dict missing 'model' → EnvVarError;
no_model is never preloaded); MARQO_PATCH_MODELS_TO_PRELOAD validates
names against the patch-model set at construction (invalid → EnvVarError,
empty OK) and warms each via chunk_image; best-available device is
exported at startup.
"""

import json
from unittest import mock

import pytest

from marqo_tpu.api import on_start_script
from marqo_tpu.api.exceptions import EnvVarError
from marqo_tpu.api.on_start_script import (CacheModels, CachePatchModels)


class TestCacheModels:
    @pytest.mark.parametrize("env_value,expected", [
        ("[]", set()),
        ("", set()),
        (json.dumps(["test"]), {"test"}),
        (json.dumps(["test", "random"]), {"test", "random"}),
    ])
    def test_preload_registry_models(self, monkeypatch, env_value,
                                     expected):
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", env_value)
        calls = []
        monkeypatch.setattr(
            on_start_script.inference, "vectorise",
            lambda model_name, content, **kw: calls.append(model_name))
        CacheModels().run()
        assert set(calls) == expected

    def test_preload_models_malformed(self, monkeypatch):
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[not-good-json")
        with pytest.raises(EnvVarError) as e:
            CacheModels()
        assert "MARQO_MODELS_TO_PRELOAD" in str(e.value)

    def test_preload_custom_model_dict(self, monkeypatch):
        model_object = {
            "model": "generic-clip-test-model-2",
            "modelProperties": {"name": "ViT-B/32", "dimensions": 512,
                                "type": "clip", "url": "https://x/y.pt"}}
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD",
                           json.dumps([model_object]))
        calls = []
        monkeypatch.setattr(
            on_start_script.inference, "vectorise",
            lambda model_name, content, **kw: calls.append(
                (model_name, kw.get("model_properties", {}).get("name"))))
        CacheModels().run()
        assert calls == [("generic-clip-test-model-2", "ViT-B/32")]

    def test_preload_missing_model_key(self, monkeypatch):
        model_object = {"model_properties": {"name": "ViT-B-32",
                                             "dimensions": 512,
                                             "type": "open_clip"}}
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD",
                           json.dumps([model_object]))
        calls = []
        monkeypatch.setattr(
            on_start_script.inference, "vectorise",
            lambda *a, **kw: calls.append(a))
        with pytest.raises(EnvVarError) as e:
            CacheModels().run()
        assert "missing 'model' key" in str(e.value)
        assert calls == []

    def test_preload_no_model_skipped(self, monkeypatch):
        no_model_object = {"model": "no_model",
                           "model_properties": {"dimensions": 123,
                                                "type": "no_model"}}
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD",
                           json.dumps([no_model_object]))
        calls = []
        monkeypatch.setattr(
            on_start_script.inference, "vectorise",
            lambda *a, **kw: calls.append(a))
        CacheModels().run()
        assert calls == []  # no_model must never be preloaded


class TestCachePatchModels:
    VALID = ["simple", "overlap", "fastercnn", "frcnn", "marqo-yolo",
             "yolox", "dino-v1", "dino-v2", "dino/v1", "dino/v2"]

    @pytest.mark.parametrize("model", VALID)
    def test_preload_patch_models(self, monkeypatch, model):
        monkeypatch.setenv("MARQO_PATCH_MODELS_TO_PRELOAD",
                           json.dumps([model]))
        calls = []
        monkeypatch.setattr(on_start_script, "chunk_image",
                            lambda img, method: calls.append(method))
        CachePatchModels().run()
        assert calls == [model]

    def test_preload_invalid_patch_model(self, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_TO_PRELOAD",
                           json.dumps(["invalid_model", "simple"]))
        with pytest.raises(EnvVarError) as e:
            CachePatchModels()
        assert "Invalid patch model: invalid_model" in str(e.value)

    def test_preload_empty_patch_models(self, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_TO_PRELOAD", json.dumps([]))
        CachePatchModels().run()  # no error

    def test_preload_malformed_patch_models(self, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_TO_PRELOAD", "[oops")
        with pytest.raises(EnvVarError):
            CachePatchModels()

    def test_patch_model_warm_failure_does_not_raise(self, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_TO_PRELOAD",
                           json.dumps(["simple"]))

        def boom(img, method):
            raise RuntimeError("no weights")

        monkeypatch.setattr(on_start_script, "chunk_image", boom)
        CachePatchModels().run()  # failures are logged, not raised

    def test_simple_patch_warm_executes_for_real(self, monkeypatch):
        """'simple' needs no weights — run the real chunker once."""
        monkeypatch.setenv("MARQO_PATCH_MODELS_TO_PRELOAD",
                           json.dumps(["simple"]))
        CachePatchModels().run()


class TestBestAvailableDevice:
    def test_set_best_available_device(self, monkeypatch):
        """on_start exports MARQO_BEST_AVAILABLE_DEVICE (reference
        SetBestAvailableDevice; ours resolves tpu/cpu instead of cuda)."""
        import os

        from marqo_tpu.inference.types import Device
        monkeypatch.delenv("MARQO_BEST_AVAILABLE_DEVICE", raising=False)
        best = Device.best_available().value
        os.environ["MARQO_BEST_AVAILABLE_DEVICE"] = best
        assert os.environ["MARQO_BEST_AVAILABLE_DEVICE"] in ("cpu", "tpu")
