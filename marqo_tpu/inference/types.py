"""Shared inference-layer types."""

from enum import Enum


class Modality(str, Enum):
    """Parity: reference s2_inference/multimodal_model_load.py Modality."""
    TEXT = "language"
    IMAGE = "image"
    VIDEO = "video"
    AUDIO = "audio"


class Device(str, Enum):
    """TPU replaces CUDA as the accelerator (reference enums.Device)."""
    CPU = "cpu"
    TPU = "tpu"

    @classmethod
    def normalize(cls, device) -> "Device":
        if device is None:
            from marqo_tpu.api import configs
            best = configs.read_env_vars_and_defaults("MARQO_BEST_AVAILABLE_DEVICE")
            return cls(best) if best else cls.best_available()
        if isinstance(device, cls):
            return device
        d = str(device).lower()
        # accept reference-style "cuda"/"cuda0" and map to the accelerator
        if d.startswith(("cuda", "gpu", "tpu")):
            return cls.TPU
        return cls.CPU

    @classmethod
    def best_available(cls) -> "Device":
        import jax
        try:
            if any(d.platform != "cpu" for d in jax.devices()):
                return cls.TPU
        except Exception:
            pass
        return cls.CPU
