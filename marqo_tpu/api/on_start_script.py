"""Startup warm-up scripts: model + patch-model preloading.

Parity: reference src/marqo/tensor_search/on_start_script.py —
``CacheModels`` (:122-195: MARQO_MODELS_TO_PRELOAD parsed as a JSON array
of strings or {model, model_properties} dicts; malformed JSON and dicts
missing the `model` key raise EnvVarError; `no_model` is skipped) and
``CachePatchModels`` (:198-230: MARQO_PATCH_MODELS_TO_PRELOAD validated
against the known patch-method set, invalid names raise EnvVarError,
then each method is warmed via chunk_image). app.on_start runs both.
"""

import json
from typing import List, Union

import numpy as np

from marqo_tpu.api import configs
from marqo_tpu.api.exceptions import EnvVarError
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.image_patching import chunk_image
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)

# reference s2_inference/constants.py:27 PATCH_MODELS (alias spellings
# included) minus the "none" sentinel
PATCH_MODELS = {"simple", "overlap", "fastercnn", "frcnn", "marqo-yolo",
                "yolox", "dino-v1", "dino-v2", "dino/v1", "dino/v2"}

# reference tensor_search/constants.py:15
MODELS_TO_SKIP_PRELOADING = {"no_model"}


def _parse_env_list(var: str, hint: str) -> list:
    raw = configs.read_env_vars_and_defaults(var)
    if raw is None or raw == "":
        return []
    if isinstance(raw, (list, tuple)):
        return list(raw)
    try:
        return json.loads(raw)
    except json.JSONDecodeError as e:
        raise EnvVarError(
            f"Could not parse environment variable `{var}`. {hint}") from e


class CacheModels:
    """Warm the in-memory model cache from MARQO_MODELS_TO_PRELOAD."""

    def __init__(self):
        self.models: List[Union[str, dict]] = _parse_env_list(
            "MARQO_MODELS_TO_PRELOAD",
            "Please ensure that this is a JSON-encoded array of strings "
            "or dicts. To add a custom model, it must be a dict with keys "
            "`model` and `model_properties`.")

    def run(self) -> None:
        for model in self.models:
            if isinstance(model, str):
                model_name, properties = model, None
            elif isinstance(model, dict):
                try:
                    model_name = model["model"]
                except KeyError as e:
                    raise EnvVarError(
                        f"Your custom model {model} is missing 'model' key. "
                        f"To add a custom model, it must be a dict with "
                        f"keys 'model' and 'model_properties'.") from e
                properties = model.get("model_properties") or \
                    model.get("modelProperties")
            else:
                continue
            if model_name in MODELS_TO_SKIP_PRELOADING:
                logger.info(f"Skipping preloading of '{model_name}' because "
                            f"the model does not require preloading.")
                continue
            try:
                inference.vectorise(model_name, ["this is a test string"],
                                    model_properties=properties)
                # compile-bucket warmup so query p50 never pays an XLA
                # compile (TPU-specific addition)
                for entry in inference._available_models.values():
                    loaded = entry["model"]
                    if hasattr(loaded, "warmup") and not getattr(
                            loaded, "_warmed", False):
                        shapes = loaded.warmup()
                        loaded._warmed = True
                        logger.info(f"Warmed {shapes} compile buckets for "
                                    f"{loaded.model_name}")
                logger.info(f"Pre-warmed model {model_name}")
            except Exception as e:
                logger.warning(f"Could not pre-warm model {model_name}: {e}")


class CachePatchModels:
    """Warm patch models from MARQO_PATCH_MODELS_TO_PRELOAD."""

    def __init__(self):
        models = _parse_env_list(
            "MARQO_PATCH_MODELS_TO_PRELOAD",
            "Please ensure that this is a JSON-encoded list of strings.")
        if not isinstance(models, list):
            raise EnvVarError(
                "Environment variable `MARQO_PATCH_MODELS_TO_PRELOAD` "
                "should be a list of strings.")
        for model in models:
            if model not in PATCH_MODELS:
                raise EnvVarError(
                    f"Invalid patch model: {model}. Please ensure that "
                    f"this is a valid patch model.")
        self.models = models

    def run(self) -> None:
        test_image = np.zeros((224, 224, 3), dtype=np.uint8)
        for model in self.models:
            try:
                chunk_image(test_image, method=model)
                logger.info(f"Prewarmed patch model: {model}")
            except Exception as e:
                logger.error(f"Failed to prewarm model: {model}. Error: {e}")
