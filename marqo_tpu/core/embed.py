"""Embed service: raw embedding generation for API clients.

Parity: reference src/marqo/core/embed/embed.py:37-131 — content may be a
string, weighted dict, or list thereof; ``content_type`` ∈ {query, document,
None} selects the model's query/chunk prefix.
"""

import time
from enum import Enum
from typing import Dict, List, Optional, Union

import numpy as np

from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.inference import vectorise as inference


class EmbedContentType(str, Enum):
    Query = "query"
    Document = "document"


class Embed:
    def __init__(self, config):
        self.config = config

    def embed_content(self, index_name: str,
                      content: Union[str, Dict[str, float], List],
                      content_type: Optional[str] = EmbedContentType.Query,
                      device: Optional[str] = None,
                      model_auth: Optional[dict] = None,
                      media_download_headers: Optional[dict] = None) -> dict:
        start = time.perf_counter()
        index = self.config.index_meta_cache.get_index(index_name)

        if content_type in (EmbedContentType.Query, "query"):
            prefix = index.model.get_text_query_prefix()
        elif content_type in (EmbedContentType.Document, "document"):
            prefix = index.model.get_text_chunk_prefix()
        elif content_type is None:
            prefix = ""
        else:
            raise InvalidArgumentError(
                f"Invalid content_type `{content_type}`. Must be one of "
                f"['query', 'document', None]")

        items = content if isinstance(content, list) else [content]
        if not items:
            raise InvalidArgumentError("Embed content list cannot be empty")

        dims = index.model.get_dimension()
        embeddings: List[List[float]] = []
        for item in items:
            if isinstance(item, str):
                if self._is_image_pointer(index, item):
                    embeddings.append(self._embed_image(
                        index, item, device, model_auth,
                        media_download_headers))
                    continue
                vectors = inference.vectorise(
                    model_name=index.model.name,
                    content=[prefix + item],
                    model_properties=(index.model.properties
                                      if index.model.custom else None),
                    device=device,
                    normalize_embeddings=index.normalize_embeddings,
                    model_auth=model_auth, enable_cache=True)
                embeddings.append(vectors[0])
            elif isinstance(item, dict):
                if not item:
                    raise InvalidArgumentError("Embed content dict cannot be empty")
                for key, weight in item.items():
                    # reference EmbedRequest pydantic validation: weighted
                    # dict values must be floats ("value is not a valid
                    # float", test_embed.py:685-702) — a 400, not a crash
                    if not isinstance(key, str):
                        raise InvalidArgumentError(
                            "Embed content dict keys must be strings")
                    if isinstance(weight, bool) or \
                            not isinstance(weight, (int, float)):
                        raise InvalidArgumentError(
                            f"value is not a valid float for weighted "
                            f"content key `{key}`")
                texts = [prefix + t for t in item]
                weights = list(item.values())
                vectors = inference.vectorise(
                    model_name=index.model.name, content=texts,
                    model_properties=(index.model.properties
                                      if index.model.custom else None),
                    device=device,
                    normalize_embeddings=index.normalize_embeddings,
                    model_auth=model_auth, enable_cache=True)
                acc = np.zeros((dims,), dtype=np.float32)
                for vec, w in zip(vectors, weights):
                    acc += np.asarray(vec, dtype=np.float32) * float(w)
                if index.normalize_embeddings:
                    norm = float(np.linalg.norm(acc))
                    if norm > 0:
                        acc /= norm
                embeddings.append(acc.tolist())
            else:
                raise InvalidArgumentError(
                    f"Embed content items must be strings or weighted dicts, "
                    f"got {type(item).__name__}")

        return {
            "content": content,
            "embeddings": embeddings,
            "processingTimeMs": (time.perf_counter() - start) * 1000,
        }

    @staticmethod
    def _is_image_pointer(index, item: str) -> bool:
        from marqo_tpu.inference.types import Modality
        from marqo_tpu.tensor_search.add_docs import (infer_modality,
                                                      is_media_pointer)
        return (getattr(index, "treat_urls_and_pointers_as_images", False)
                and is_media_pointer(item)
                and infer_modality(item) == Modality.IMAGE)

    @staticmethod
    def _embed_image(index, pointer: str, device, model_auth,
                     media_download_headers=None) -> List[float]:
        from marqo_tpu.inference.types import Modality
        from marqo_tpu.ops.image_ops import host_decode
        from marqo_tpu.tensor_search.add_docs import fetch_content
        image = host_decode(fetch_content(pointer, media_download_headers))
        vectors = inference.vectorise(
            model_name=index.model.name, content=[image],
            model_properties=(index.model.properties
                              if index.model.custom else None),
            device=device, normalize_embeddings=index.normalize_embeddings,
            model_auth=model_auth, modality=Modality.IMAGE)
        return vectors[0]
