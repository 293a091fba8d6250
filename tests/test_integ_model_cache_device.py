"""Ported reference tests: model cache management + default device.

Sources: /root/reference/tests/tensor_search/test_model_cache_management.py
(eject message format, ModelNotInCacheError, loaded-model listing) and
test_default_device.py (MARQO_BEST_AVAILABLE_DEVICE flows to vectorise
when device is unset; an explicit device always wins).
"""

import pytest

from marqo_tpu.core.exceptions import ModelNotInCacheError
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.types import Device


@pytest.fixture(autouse=True)
def clean_models():
    inference.clear_loaded_models()
    yield
    inference.clear_loaded_models()


class TestModelCacheManagement:
    def test_eject_model_message_format(self):
        inference.vectorise("test", ["warm me up"], device="cpu")
        res = inference.eject_model("test", "cpu")
        assert res["message"] == ("successfully eject model_name `test` "
                                  "from device `cpu`")
        assert inference.get_loaded_models()["models"] == []

    def test_eject_missing_model_raises(self):
        for name in ("test-model-1", "test-model-2"):
            with pytest.raises(ModelNotInCacheError):
                inference.eject_model(name, "cpu")

    def test_loaded_models_listing(self):
        inference.vectorise("test", ["a"], device="cpu")
        inference.vectorise("random", ["a"], device="cpu")
        models = inference.get_loaded_models()["models"]
        names = {m["model_name"] for m in models}
        assert names == {"test", "random"}
        for m in models:
            assert m["model_device"] == "cpu"


class TestDefaultDevice:
    def test_best_available_device_used_when_none(self, monkeypatch):
        monkeypatch.setenv("MARQO_BEST_AVAILABLE_DEVICE", "cpu")
        assert Device.normalize(None) == Device.CPU

    def test_explicit_device_wins(self, monkeypatch):
        monkeypatch.setenv("MARQO_BEST_AVAILABLE_DEVICE", "tpu")
        assert Device.normalize("cpu") == Device.CPU

    def test_cuda_style_names_map_to_accelerator(self):
        # reference-style device strings are accepted
        assert Device.normalize("cuda") != Device.CPU
        assert Device.normalize("cuda:0") != Device.CPU

    def test_vectorise_uses_default_device(self, monkeypatch):
        """device=None must resolve via MARQO_BEST_AVAILABLE_DEVICE and
        load the model on that device."""
        monkeypatch.setenv("MARQO_BEST_AVAILABLE_DEVICE", "cpu")
        inference.vectorise("test", ["content"], device=None)
        models = inference.get_loaded_models()["models"]
        assert models[0]["model_device"] == "cpu"
