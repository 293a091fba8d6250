"""Post-search reranking.

Parity: reference s2_inference/reranking/rerank.py:12-54 — rerank mutates
the search result in place, overwriting ``_score`` with the cross-encoder
relevance and re-sorting; requires ``searchable_attributes`` so it knows
which fields carry the text (same constraint as the reference). Reranker
model cache mirrors the embedding-model cache keying.
"""

import threading
from typing import Dict, List, Optional

from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.inference.types import Device
from marqo_tpu.models.cross_encoder import JaxCrossEncoder

_rerankers: Dict[str, JaxCrossEncoder] = {}
_lock = threading.Lock()

# reference registers the ms-marco cross-encoder family
KNOWN_RERANKERS = {
    "cross-encoder/ms-marco-MiniLM-L-6-v2",
    "cross-encoder/ms-marco-MiniLM-L-12-v2",
    "cross-encoder/ms-marco-TinyBERT-L-2-v2",
    "cross-encoder/ms-marco-TinyBERT-L-4",
    "cross-encoder/ms-marco-TinyBERT-L-6",
}


def _get_reranker(model_name: str, device: Device,
                  properties: Optional[dict] = None) -> JaxCrossEncoder:
    key = f"{model_name}||{device.value}"
    with _lock:
        if key not in _rerankers:
            model = JaxCrossEncoder(model_name, device, properties)
            model.load()
            _rerankers[key] = model
        return _rerankers[key]


def clear_rerankers() -> None:
    _rerankers.clear()


def rerank_search_results(search_result: dict, query: str, model_name: str,
                          device: Optional[str] = None,
                          searchable_attributes: Optional[List[str]] = None,
                          properties: Optional[dict] = None) -> None:
    """Re-scores ``search_result['hits']`` in place."""
    if searchable_attributes is None:
        raise InvalidArgumentError(
            "searchable_attributes cannot be None when re-ranking. Specify "
            "which fields to extract text from.")
    if not isinstance(query, str):
        raise InvalidArgumentError(
            "Re-ranking requires a string query")
    hits = search_result.get("hits", [])
    if not hits:
        return
    model = _get_reranker(model_name, Device.normalize(device), properties)
    texts = []
    for hit in hits:
        parts = [str(hit[attr]) for attr in searchable_attributes
                 if attr in hit and isinstance(hit.get(attr), (str, int, float))]
        texts.append(" ".join(parts) if parts else "")
    scores = model.score(query, texts)
    for hit, score in zip(hits, scores):
        hit["_score"] = float(score)
    hits.sort(key=lambda h: -h["_score"])
