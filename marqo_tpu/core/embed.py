"""Embed service: raw embedding generation for API clients.

Parity: reference src/marqo/core/embed/embed.py:37-131 — content may be a
string, weighted dict, or list thereof; ``content_type`` ∈ {query, document,
None} selects the model's query/chunk prefix.
"""

import time
from enum import Enum
from typing import Dict, List, Optional, Union

from marqo_tpu.core.exceptions import InvalidArgumentError


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
            prefix_override = None  # index default query prefix
        elif content_type in (EmbedContentType.Document, "document"):
            prefix_override = index.model.get_text_chunk_prefix()
        elif content_type is None:
            prefix_override = ""
        else:
            raise InvalidArgumentError(
                f"Invalid content_type `{content_type}`. Must be one of "
                f"['query', 'document', None]")

        items = content if isinstance(content, list) else [content]
        if not items:
            raise InvalidArgumentError("Embed content list cannot be empty")

        # one vector per item, each computed by the SAME pipeline a search
        # query goes through (reference embed.py:85-109 builds
        # BulkSearchQueryEntity per item and calls run_vectorise_pipeline):
        # media-pointer keys embed as media, prefixes apply to text only,
        # weighted parts mean-merge — embed(x) == the query vector for x.
        from marqo_tpu.tensor_search.tensor_search import compute_query_vector
        embeddings: List[List[float]] = []
        for item in items:
            if isinstance(item, dict):
                if not item:
                    raise InvalidArgumentError(
                        "Embed content dict cannot be empty")
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
            elif not isinstance(item, str):
                raise InvalidArgumentError(
                    f"Embed content items must be strings or weighted dicts, "
                    f"got {type(item).__name__}")
            embeddings.append(compute_query_vector(
                index, item, context=None, device=device,
                text_query_prefix=prefix_override, model_auth=model_auth,
                media_download_headers=media_download_headers))

        return {
            "content": content,
            "embeddings": embeddings,
            "processingTimeMs": (time.perf_counter() - start) * 1000,
        }
