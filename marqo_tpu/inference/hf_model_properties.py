"""Validated model_properties for hf / hf_stella custom models.

Parity: reference core/inference/embedding_models/
hugging_face_model_properties.py — PoolingMethod enum, camelCase aliases
(poolingMethod, modelLocation, trustRemoteCode), type restricted to
hf/hf_stella, tokens default 128, url XOR model_location, at least one of
name/url/model_location, and pooling inferred from the model's
1_Pooling/config.json when unspecified (defaults to mean when the hub is
unreachable — always the case in offline deployments).
"""

import json
from enum import Enum
from typing import Optional

from pydantic import BaseModel, ConfigDict, Field, field_validator, \
    model_validator

from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class PoolingMethod(str, Enum):
    Mean = "mean"
    CLS = "cls"


class HfModelLocation(BaseModel):
    model_config = ConfigDict(populate_by_name=True, protected_namespaces=())
    repo_id: str = Field(..., alias="repoId")
    filename: Optional[str] = None


class ModelLocation(BaseModel):
    model_config = ConfigDict(populate_by_name=True, protected_namespaces=())
    s3: Optional[dict] = None
    hf: Optional[HfModelLocation] = None
    auth_required: bool = Field(False, alias="authRequired")


class HuggingFaceModelProperties(BaseModel):
    model_config = ConfigDict(populate_by_name=True, extra="allow",
                              protected_namespaces=())

    name: Optional[str] = None
    tokens: int = 128
    type: str
    url: Optional[str] = None
    dimensions: int
    model_location: Optional[ModelLocation] = Field(
        default=None, alias="modelLocation")
    note: Optional[str] = None
    pooling_method: Optional[PoolingMethod] = Field(
        default=None, alias="poolingMethod")
    trust_remote_code: bool = Field(False, alias="trustRemoteCode")

    @field_validator("type")
    @classmethod
    def _validate_type(cls, v):
        if v not in ("hf", "hf_stella"):
            raise ValueError(
                "The type of the model should be 'hf' or 'hf_stella'.")
        return v

    @model_validator(mode="after")
    def _validate_sources_and_pooling(self):
        if self.url is not None and self.model_location is not None:
            raise ValueError(
                "Only one of 'url' and 'model_location' should be provided.")
        if not (self.name or self.url or self.model_location):
            raise ValueError(
                "At least one of 'name', 'url', or 'model_location' should "
                "be provided.")
        if self.pooling_method is None:
            if isinstance(self.name, str) and self.name:
                object.__setattr__(
                    self, "pooling_method",
                    self._infer_pooling_method_from_name(self.name))
            else:
                object.__setattr__(self, "pooling_method",
                                   PoolingMethod.Mean)
        return self

    @staticmethod
    def _infer_pooling_method_from_name(name: str) -> PoolingMethod:
        """Look up 1_Pooling/config.json on the hub (sentence-transformers
        layout); default to mean when unreachable/unparseable (reference
        :89-125 — the only possible path in offline deployments)."""
        def default():
            logger.warning(f"Could not infer pooling method from the model "
                           f"{name}. Defaulting to mean pooling.")
            return PoolingMethod.Mean

        try:
            from huggingface_hub import hf_hub_download
            # cache-only first: instant, and the only path that can
            # succeed offline; fall back to one quick network attempt
            try:
                path = hf_hub_download(name, "1_Pooling/config.json",
                                       local_files_only=True)
            except Exception:
                # the hub client retries DNS failures for ~25s; probe
                # resolvability first so offline deployments fail in ms
                import socket
                socket.getaddrinfo("huggingface.co", 443)
                path = hf_hub_download(name, "1_Pooling/config.json",
                                       etag_timeout=3)
            with open(path) as f:
                content = json.load(f)
        except Exception:
            return default()
        if not isinstance(content, dict):
            return default()
        if content.get("pooling_mode_cls_token") is True:
            return PoolingMethod.CLS
        if content.get("pooling_mode_mean_tokens") is True:
            return PoolingMethod.Mean
        return default()
