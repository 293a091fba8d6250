"""Remote engine client: same interface as StoreEngine, HTTP transport.

Role parity: reference src/marqo/vespa/vespa_client.py — pooled HTTP access
to the store (query/feed/get/delete/stats; pool sizes per op,
vespa_client.py:267-296) with batch fan-out on a thread pool. Orchestration
code is transport-agnostic: Config wires an in-process StoreEngine by
default and a RemoteStoreEngine when MARQO_ENGINE_QUERY_URL is set — the
reference's co-deployed-vs-external Vespa split (run_marqo.sh:38-100).
"""

import concurrent.futures
import threading
from typing import Dict, List, Optional
from urllib.parse import quote

import httpx

from marqo_tpu.api import configs
from marqo_tpu.core.exceptions import (BackendCommunicationError,
                                       BackendTimeoutError,
                                       IndexExistsError, IndexNotFoundError,
                                       InvalidArgumentError)
from marqo_tpu.core.models.score_modifier import ScoreModifier
from marqo_tpu.core.search.search_filter import SearchFilter
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import Hit, QueryResult
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


def _error_message(body: str) -> str:
    """Best-effort message extraction from an engine error body."""
    try:
        import json
        return json.loads(body).get("message", body)
    except Exception:
        return body


def _filter_str(search_filter: Optional[SearchFilter]) -> Optional[str]:
    return str(search_filter) if search_filter is not None else None


def _mods_json(mods: Optional[List[ScoreModifier]]):
    if not mods:
        return None
    return [{"field": m.field, "weight": m.weight, "type": m.type.value}
            for m in mods]


# engine-shard HTTP status → per-document API (status, message), the role
# of the reference's VespaClient.translate_vespa_document_response
# (vespa_client.py:579-607; matrix pinned by tests/vespa/
# test_vespa_client.py:433-457)
_ENGINE_DOC_STATUS_MAP = {
    200: (200, None),
    404: (404, "Document does not exist in the index"),
    # conditional updates report missing docs as 412
    412: (404, "Document does not exist in the index"),
    429: (429, "Marqo vector store receives too many requests. "
               "Please try again later"),
    507: (400, "Marqo vector store is out of memory or disk space"),
}


class EngineHTTPError(BackendCommunicationError):
    """Engine-shard HTTP error carrying the upstream status for per-doc
    translation (role of httpx.HTTPStatusError in the reference client)."""

    def __init__(self, status: int, body: str):
        self.status = status
        self.body = body
        super().__init__(f"Engine error {status}: {body}")


def translate_engine_document_response(status: int,
                                       message: Optional[str] = None):
    """Translate an engine-shard document response to the API's
    per-document (status, message). Unexpected statuses log an error and
    become a 500."""
    if status in _ENGINE_DOC_STATUS_MAP:
        return _ENGINE_DOC_STATUS_MAP[status]
    if status == 400 and isinstance(message, str) and \
            "could not parse field" in message.lower():
        return 400, (f"The document contains invalid characters in the "
                     f"fields. Original error: {message} ")
    logger.error(f"An unexpected error occurred from the engine document "
                 f"response. status: {status}, message: {message}")
    return 500, ("Marqo vector store returns an unexpected error with "
                 "this document")


class RemoteStoreEngine:
    """StoreEngine-compatible facade over an engine shard server."""

    def __init__(self, base_url: str, timeout: float = 10.0,
                 pool_size: Optional[int] = None):
        self.base_url = base_url.rstrip("/")
        self._pool_size = pool_size or 10
        self._client = httpx.Client(
            base_url=self.base_url, timeout=timeout,
            limits=httpx.Limits(max_connections=self._pool_size * 2,
                                max_keepalive_connections=self._pool_size))
        # long-lived like the httpx pool beside it: feed_batch runs once
        # per ingest batch, and spawning+joining 10 threads per batch is
        # measurable host-side cost on the host-bound ingest path
        self._executor = None
        self._executor_lock = threading.Lock()

    def _feed_executor(self):
        if self._executor is None:
            with self._executor_lock:
                if self._executor is None:
                    self._executor = concurrent.futures.ThreadPoolExecutor(
                        max_workers=self._pool_size,
                        thread_name_prefix="engine-feed")
        return self._executor

    # -- plumbing --

    def _request(self, method: str, path: str, json_body=None,
                 params=None, timeout=None) -> dict:
        try:
            resp = self._client.request(
                method, path, json=json_body, params=params,
                **({"timeout": timeout} if timeout is not None else {}))
        except httpx.HTTPError as e:
            raise BackendCommunicationError(
                f"Engine request {method} {path} failed: {e}") from e
        return self._handle_response(resp)

    @staticmethod
    def _handle_response(resp) -> dict:
        if resp.status_code == 404:
            try:
                body = resp.json()
            except Exception:
                # an HTML 404 from a proxy/LB or a base_url mismatch is a
                # broken backend, not a legitimately-absent resource
                raise EngineHTTPError(404, resp.text[:500])
            if body.get("code") == "index_not_found":
                raise IndexNotFoundError(body.get("message", "not found"))
            if body.get("code") == "document_not_found":
                return {}  # absent doc: callers read .get(...) as missing
            # unknown-route/other 404s must fail loudly — silently
            # returning {} here made use_existing_tensors re-embed every
            # doc and cluster BM25 stats quietly degrade
            raise EngineHTTPError(404, resp.text[:500])
        if resp.status_code == 409:
            raise IndexExistsError(resp.json().get("message", "conflict"))
        if resp.status_code >= 400:
            raise EngineHTTPError(resp.status_code, resp.text[:500])
        return resp.json()

    # -- DDL --

    def create_index(self, descriptor: IndexDescriptor) -> None:
        self._request("POST", "/engine/indexes", descriptor.to_json())

    def update_index(self, descriptor: IndexDescriptor) -> None:
        self._request("POST", f"/engine/indexes/{descriptor.name}/update",
                      descriptor.to_json())

    def delete_index(self, name: str) -> None:
        self._request("DELETE", f"/engine/indexes/{name}")

    def has_index(self, name: str) -> bool:
        return name in self.list_indexes()

    def list_indexes(self) -> List[str]:
        return self._request("GET", "/engine/indexes")["indexes"]

    # -- documents --

    def feed(self, index_name: str, doc_id: str, fields: dict,
             tensors: Optional[dict] = None) -> None:
        wire_tensors = {}
        for field, payload in (tensors or {}).items():
            emb = payload["embeddings"]
            wire_tensors[field] = {
                "chunks": payload["chunks"],
                "embeddings": (emb.tolist() if hasattr(emb, "tolist")
                               else emb),
            }
        self._request("POST", f"/engine/indexes/{index_name}/docs",
                      {"id": doc_id, "fields": fields,
                       "tensors": wire_tensors})

    def feed_batch(self, index_name: str, docs: List[dict]) -> List[dict]:
        """Concurrent batch feed (reference feed_batch semaphore pool,
        vespa_client.py:267,771)."""
        results = [None] * len(docs)

        def one(i, doc):
            try:
                self.feed(index_name, doc["id"], doc.get("fields", {}),
                          doc.get("tensors"))
                return i, {"id": doc["id"], "status": 200}
            except EngineHTTPError as e:
                # per-doc status translation (reference vespa_client.py:
                # 579-607 translate_vespa_document_response)
                status, message = translate_engine_document_response(
                    e.status, e.body)
                return i, {"id": doc.get("id"), "status": status,
                           "message": message}
            except Exception as e:
                return i, {"id": doc.get("id"), "status": 500,
                           "message": str(e)}

        for i, result in self._feed_executor().map(lambda p: one(*p),
                                                   enumerate(docs)):
            results[i] = result
        return results

    def get(self, index_name: str, doc_id: str) -> Optional[dict]:
        body = self._request("GET",
                             f"/engine/indexes/{index_name}/docs/{quote(doc_id, safe='')}")
        return body.get("fields")

    def get_tensors(self, index_name: str, doc_id: str) -> Dict[str, list]:
        body = self._request("GET",
                             f"/engine/indexes/{index_name}/docs/{quote(doc_id, safe='')}",
                             params={"tensors": "true"})
        return body.get("tensors", {})

    def update(self, index_name: str, doc_id: str, updates: dict) -> bool:
        """Atomic partial update on the engine node (server-side merge
        under the shard lock). Returns False when the doc doesn't exist."""
        return bool(self._request(
            "POST",
            f"/engine/indexes/{index_name}/docs/{quote(doc_id, safe='')}/update",
            {"updates": updates}).get("found"))

    def delete(self, index_name: str, doc_id: str) -> bool:
        return bool(self._request(
            "DELETE", f"/engine/indexes/{index_name}/docs/{quote(doc_id, safe='')}"
        ).get("found"))

    def delete_all(self, index_name: str) -> int:
        return int(self._request(
            "POST", f"/engine/indexes/{index_name}/delete-all")["deleted"])

    def doc_count(self, index_name: str) -> int:
        return int(self._request(
            "GET", f"/engine/indexes/{index_name}/stats")["documents"])

    def vector_count(self, index_name: str) -> int:
        return int(self._request(
            "GET", f"/engine/indexes/{index_name}/stats")["vectors"])

    # -- queries --

    def _query(self, index_name: str, body: dict) -> QueryResult:
        """Query with the search deadline enforced per request (reference
        vespa_client.py:229 sets query['timeout']=VESPA_SEARCH_TIMEOUT_MS
        on every Vespa search; here the read timeout plays that role — a
        slow/hung shard fails the query with BackendTimeoutError instead
        of hanging the API)."""
        timeout_ms = configs.read_env_vars_and_defaults_ints(
            "MARQO_SEARCH_TIMEOUT_MS") or 1000
        try:
            resp = self._client.request(
                "POST", f"/engine/indexes/{index_name}/query", json=body,
                timeout=httpx.Timeout(5.0, read=timeout_ms / 1000.0))
        except httpx.ReadTimeout as e:
            # ONLY a read timeout is the search deadline; blaming pool
            # exhaustion or connect failures on MARQO_SEARCH_TIMEOUT_MS
            # sends operators to debug shard latency when the problem is
            # client-side
            raise BackendTimeoutError(
                f"Engine query on `{index_name}` exceeded the "
                f"{timeout_ms}ms search timeout "
                f"(MARQO_SEARCH_TIMEOUT_MS)") from e
        except httpx.TimeoutException as e:
            raise BackendCommunicationError(
                f"Engine query on `{index_name}` failed before the search "
                f"deadline ({type(e).__name__}: connect/pool/write "
                f"timeout — check connectivity and client pool size)"
            ) from e
        except httpx.HTTPError as e:
            raise BackendCommunicationError(
                f"Engine query on `{index_name}` failed: {e}") from e
        try:
            data = self._handle_response(resp)
        except EngineHTTPError as e:
            if e.status == 400:
                # the engine rejected the query as invalid (its own 400
                # invalid_argument) — surface the same 400 the in-process
                # engine raises, and don't let read_one failover retry a
                # deterministic client error on every replica
                raise InvalidArgumentError(_error_message(e.body)) from e
            raise
        hits = [Hit(h["id"], h["score"], h.get("fields", {}),
                    h.get("highlight"),
                    h.get("raw_tensor_score"), h.get("raw_lexical_score"))
                for h in data.get("hits", [])]
        return QueryResult(hits, data.get("total", len(hits)))

    def query_tensor(self, index_name: str, vector, limit: int,
                     offset: int = 0, searchable_fields=None,
                     search_filter=None, score_modifiers=None,
                     ef_search=None, approximate=True,
                     attributes_to_retrieve=None,
                     expose_facets=False) -> QueryResult:
        vec = vector.tolist() if hasattr(vector, "tolist") else list(vector)
        return self._query(index_name, {
            "type": "tensor", "vector": vec, "limit": limit,
            "offset": offset, "searchable_fields": searchable_fields,
            "filter": _filter_str(search_filter),
            "score_modifiers": _mods_json(score_modifiers),
            "ef_search": ef_search, "approximate": approximate,
            "attributes_to_retrieve": attributes_to_retrieve,
            "expose_facets": expose_facets})

    def query_lexical(self, index_name: str, or_phrases, and_phrases,
                      limit: int, offset: int = 0, searchable_fields=None,
                      search_filter=None, score_modifiers=None,
                      attributes_to_retrieve=None,
                      expose_facets=False, global_stats=None) -> QueryResult:
        return self._query(index_name, {
            "type": "lexical", "or_phrases": or_phrases,
            "and_phrases": and_phrases, "limit": limit, "offset": offset,
            "searchable_fields": searchable_fields,
            "filter": _filter_str(search_filter),
            "score_modifiers": _mods_json(score_modifiers),
            "attributes_to_retrieve": attributes_to_retrieve,
            "expose_facets": expose_facets, "global_stats": global_stats})

    def engine_health(self) -> dict:
        """Probe the engine server (short timeout: a hung shard must not
        hang /health). Red on any transport failure. Uses a FRESH
        connection, never the keepalive pool — a node that stopped
        accepting connections can still answer on an old socket, and a
        liveness probe must not be fooled by that."""
        try:
            resp = httpx.get(f"{self.base_url}/engine/health", timeout=2.0)
            body = resp.json() if resp.status_code < 400 else {}
            status = body.get("status", "red") if resp.status_code < 400 \
                else "red"
        except Exception:
            body, status = {}, "red"
        node = {"url": self.base_url, "status": status}
        for key in ("memoryIsAvailable", "storageIsAvailable",
                    "feed_blocked"):
            if key in body:
                node[key] = body[key]
        return {"status": status, "nodes": [node]}

    # Heal traffic moves whole indexes: the pooled client's 10s default
    # would fail every sizeable dump/sync client-side while the server
    # completes it, re-flagging the shard and relaunching full-index
    # dumps every tick — an endless sync storm. Long explicit deadlines.
    _HEAL_TIMEOUT_S = 300.0

    def dump_index(self, index_name: str) -> dict:
        return self._request("GET", f"/engine/indexes/{index_name}/dump",
                             timeout=self._HEAL_TIMEOUT_S)

    def sync_from(self, source_url: str, index_name: str) -> dict:
        return self._request("POST", "/engine/sync-from",
                             {"source_url": source_url,
                              "index_name": index_name},
                             timeout=self._HEAL_TIMEOUT_S)

    def index_digest(self, index_name: str) -> dict:
        return self._request("GET", f"/engine/indexes/{index_name}/digest")

    def lexical_stats(self, index_name: str, terms,
                      searchable_fields=None) -> dict:
        return self._request(
            "POST", f"/engine/indexes/{index_name}/lexical-stats",
            {"terms": list(terms), "searchable_fields": searchable_fields})

    def query_hybrid(self, index_name: str, vector, or_phrases, and_phrases,
                     limit: int, offset: int = 0,
                     retrieval_method="disjunction", ranking_method="rrf",
                     alpha=0.5, rrf_k=60, searchable_fields_tensor=None,
                     searchable_fields_lexical=None, search_filter=None,
                     score_modifiers_tensor=None,
                     score_modifiers_lexical=None, ef_search=None,
                     approximate=True, attributes_to_retrieve=None,
                     expose_facets=False, global_stats=None) -> QueryResult:
        vec = vector.tolist() if hasattr(vector, "tolist") else list(vector)
        return self._query(index_name, {
            "type": "hybrid", "vector": vec, "or_phrases": or_phrases,
            "and_phrases": and_phrases, "limit": limit, "offset": offset,
            "retrieval_method": retrieval_method,
            "ranking_method": ranking_method, "alpha": alpha, "rrf_k": rrf_k,
            "searchable_fields_tensor": searchable_fields_tensor,
            "searchable_fields_lexical": searchable_fields_lexical,
            "filter": _filter_str(search_filter),
            "score_modifiers_tensor": _mods_json(score_modifiers_tensor),
            "score_modifiers_lexical": _mods_json(score_modifiers_lexical),
            "ef_search": ef_search, "approximate": approximate,
            "attributes_to_retrieve": attributes_to_retrieve,
            "expose_facets": expose_facets, "global_stats": global_stats})

    def close(self) -> None:
        self._client.close()
        if self._executor is not None:
            self._executor.shutdown(wait=False)


def engine_from_env():
    """Build the configured engine:
      MARQO_ENGINE_CLUSTER='[["http://a","http://b"],["http://c"]]'
        → sharded+replicated ClusterEngine over DCN
      MARQO_ENGINE_QUERY_URL=http://host:8080 → single remote engine
      neither → in-process StoreEngine (co-deployed mode)
    """
    import json as _json
    cluster = configs.read_env_vars_and_defaults("MARQO_ENGINE_CLUSTER")
    if cluster:
        from marqo_tpu.engine.cluster import ClusterEngine
        topology = (_json.loads(cluster) if isinstance(cluster, str)
                    else cluster)
        logger.info(f"Using engine cluster: {topology}")
        return ClusterEngine(topology)
    url = configs.read_env_vars_and_defaults("MARQO_ENGINE_QUERY_URL")
    if url:
        logger.info(f"Using remote engine at {url}")
        return RemoteStoreEngine(str(url))
    from marqo_tpu.engine.store import StoreEngine
    n_shards = configs.read_env_vars_and_defaults_ints("MARQO_ENGINE_SHARDS") or 1
    return StoreEngine(n_shards=n_shards)
