"""Port of reference tests/s2_inference/test_automatic_model_ejection_and_concurrency.py.

TestAutomaticModelEject's 6 cache-management tests (the 3 concurrency tests
of that file live in tests/test_integ_vectorise_batching.py). The reference
loads real checkpoints; here load_model is patched to a tiny stub model so
the tests exercise exactly the cache-management layer: the pre-load device
validation chain (_update_available_models -> _validate_model_into_device ->
_check_memory_threshold_for_model, s2_inference.py:286-500), get_model_size
estimate priority (s2_inference.py:503-518), the calling_func thread-safety
guards (s2_inference.py:435,476), and LRU ejection under a memory threshold.
"""

import unittest.mock

import numpy as np
import pytest

from marqo_tpu.api.exceptions import ModelCacheManagementError
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.loaders import EmbeddingModel
from marqo_tpu.inference.types import Device
from marqo_tpu.inference.vectorise import (_check_memory_threshold_for_model,
                                           _validate_model_into_device,
                                           get_model_size,
                                           validate_model_properties,
                                           vectorise)

SMALL_LIST_OF_MODELS = [
    'open_clip/convnext_base_w_320/laion_aesthetic_s13b_b82k',
    "sentence-transformers/all-MiniLM-L6-v2",
    "flax-sentence-embeddings/all_datasets_v4_mpnet-base",
    'open_clip/ViT-B-16/laion2b_s34b_b88k',
]
CONTENT = "Try to kill the cpu"


class _StubModel(EmbeddingModel):
    """Tiny stand-in for a real checkpoint load (no hub egress here)."""

    def load(self) -> None:
        self.loaded = True

    def memory_bytes(self) -> int:
        # matches the pre-load estimate so entry sizes equal get_model_size
        return int(get_model_size(self.model_name, self.properties)
                   * (1024 ** 3))

    def encode(self, contents, normalize=True, modality=None) -> np.ndarray:
        dims = self.dimensions or 32
        rng = np.random.default_rng(0)
        out = rng.standard_normal((len(contents), dims)).astype(np.float32)
        if normalize:
            out /= np.linalg.norm(out, axis=1, keepdims=True)
        return out


def _stub_load(model_name, properties, device, model_auth=None):
    model = _StubModel(model_name, properties, device, model_auth)
    model.load()
    return model


@pytest.fixture(autouse=True)
def stub_models(monkeypatch):
    inference.clear_loaded_models()
    monkeypatch.setattr(inference, "load_model", _stub_load)
    yield
    inference.clear_loaded_models()


class TestAutomaticModelEject:
    def test_validate_model_into_device(self, monkeypatch):
        """Every first-time load runs the device validation with the model
        name (reference test_validate_model_into_device)."""
        with unittest.mock.patch(
                "marqo_tpu.inference.vectorise._validate_model_into_device"
        ) as mock_method:
            for model in SMALL_LIST_OF_MODELS:
                vectorise(model_name=model, content=CONTENT, device="cpu")
        checked_models = [call_args[0] for call_args, _
                          in mock_method.call_args_list]
        assert checked_models == SMALL_LIST_OF_MODELS

    def test_check_memory_threshold_for_model(self, monkeypatch):
        """The threshold check runs once per load, against the target
        device (reference test_check_memory_threshold_for_model)."""
        with unittest.mock.patch(
                "marqo_tpu.inference.vectorise."
                "_check_memory_threshold_for_model", return_value=True
        ) as mock_method:
            for model in SMALL_LIST_OF_MODELS:
                vectorise(model_name=model, content=CONTENT, device="cpu")
            checked_devices = [call_args[0] for call_args, _
                               in mock_method.call_args_list]
        assert len(checked_devices) == len(SMALL_LIST_OF_MODELS)
        assert set(checked_devices) == {Device.CPU}

    def test_load_very_large_model(self):
        """A model whose estimate exceeds the device threshold is rejected
        with the CANNOT-find-enough-space error (reference
        test_load_very_large_model, active here: the estimate needs no
        download)."""
        with pytest.raises(ModelCacheManagementError) as exc:
            vectorise(model_name="my_huge_model",
                      model_properties={"name": "huge", "type": "clip",
                                        "dimensions": 16, "model_size": 20},
                      content="this is a huge model", device="cpu")
        assert "CANNOT find enough space" in str(exc.value)

    def test_get_model_size(self):
        models_and_sizes = {
            "open_clip/ViT-L-14/openai": 1.5,
            'open_clip/ViT-L-14/laion400m_e31': 1.5,
            'open_clip/convnext_base_w_320/laion_aesthetic_s13b_b82k': 1,
            "sentence-transformers/all-MiniLM-L6-v2": 0.7,
            "flax-sentence-embeddings/all_datasets_v4_mpnet-base": 0.7,
            'open_clip/ViT-B-16/laion2b_s34b_b88k': 1,
            'open_clip/coca_ViT-L-14/laion2b_s13b_b90k': 1.5,
            'open_clip/RN50x64/openai': 1,
            "onnx16/open_clip/ViT-B-32/laion2b_e16": 1,
        }
        for model_name, size in models_and_sizes.items():
            assert get_model_size(
                model_name,
                validate_model_properties(model_name, None)) == size, \
                model_name

        generic = {
            "model_name": "my_custom_clip",
            "model_properties_1": {"name": "ViT-L-14", "type": "open_clip",
                                   "dimensions": 768, "model_size": 1.53},
            "model_properties_2": {"name": "ViT-L/14", "dimensions": 768,
                                   "type": "clip"},
        }
        assert get_model_size(generic["model_name"],
                              generic["model_properties_1"]) == 1.53
        assert get_model_size(generic["model_name"],
                              generic["model_properties_2"]) == 1.5

    def test_model_management(self, monkeypatch):
        """Loading many models in sequence never errors and never exceeds
        the device threshold: LRU ejection frees space automatically
        (reference test_model_management, which would OOM without it)."""
        monkeypatch.setenv("MARQO_MAX_CPU_MODEL_MEMORY", "4")
        list_of_models = [
            "fp16/ViT-B/32", "open_clip/convnext_base_w/laion2b_s13b_b82k",
            "open_clip/convnext_base_w_320/laion_aesthetic_s13b_b82k_augreg",
            "onnx16/open_clip/ViT-B-32/laion400m_e32",
            'onnx32/open_clip/ViT-B-32-quickgelu/laion400m_e32',
            "all-MiniLM-L6-v1", "all_datasets_v4_MiniLM-L6",
            "hf/all-MiniLM-L6-v1", "hf/all_datasets_v4_MiniLM-L6",
            "onnx/all-MiniLM-L6-v1", "onnx/all_datasets_v4_MiniLM-L6",
        ]
        for model in list_of_models:
            vectorise(model_name=model, content=CONTENT, device="cpu")
            assert inference._used_memory_gib(Device.CPU) <= 4.0
        # ejections actually happened: not every model is still cached
        assert len(inference._available_models) < len(list_of_models)

    def test_thread_safe_function_call(self):
        """The internal validation functions reject unknown callers
        (reference test_thread_safe_function_call)."""
        model_name = "ViT-B/32"
        props = validate_model_properties(model_name, None)
        device = Device.CPU
        model_size = 1

        _validate_model_into_device(model_name, props, device,
                                    calling_func="_update_available_models")
        _validate_model_into_device(model_name, props, device,
                                    calling_func="unit_test")
        with pytest.raises(RuntimeError):
            _validate_model_into_device(model_name, props, device)
        with pytest.raises(RuntimeError):
            _validate_model_into_device(model_name, props, device,
                                        calling_func="void")

        _check_memory_threshold_for_model(
            device, model_size, calling_func="_validate_model_into_device")
        _check_memory_threshold_for_model(device, model_size,
                                          calling_func="unit_test")
        with pytest.raises(RuntimeError):
            _check_memory_threshold_for_model(device, model_size)
        with pytest.raises(RuntimeError):
            _check_memory_threshold_for_model(device, model_size,
                                              calling_func="void")
