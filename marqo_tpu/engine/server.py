"""Engine shard server: the store engine behind an HTTP surface.

Role parity: Vespa's query (:8080 /search/) and document (/document/v1)
APIs (reference vespa_client.py drives them over HTTP). Running the engine
as its own process/host enables the reference's deployment shape — API
replicas in front, content shards behind, DCN between them (SURVEY.md D1) —
while single-node deployments keep the engine in-process and skip the hop.

Endpoints (JSON):
  POST /engine/indexes                    {descriptor}
  POST /engine/indexes/{name}/update      {descriptor}
  DELETE /engine/indexes/{name}
  GET  /engine/indexes
  POST /engine/indexes/{name}/docs        {id, fields, tensors}
  GET  /engine/indexes/{name}/docs/{id}   ?tensors=true
  DELETE /engine/indexes/{name}/docs/{id}
  POST /engine/indexes/{name}/query       {type: tensor|lexical|hybrid, ...}
  POST /engine/indexes/{name}/delete-all
  GET  /engine/indexes/{name}/stats
  GET  /engine/health
"""

from typing import Optional

from marqo_tpu.core.exceptions import (IndexExistsError, IndexNotFoundError,
                                       InvalidArgumentError)
from marqo_tpu.core.models.score_modifier import ScoreModifier
from marqo_tpu.core.search.search_filter import MarqoFilterStringParser
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.store import StoreEngine
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


def _parse_filter(raw: Optional[str]):
    return MarqoFilterStringParser().parse(raw) if raw else None


def _require(body, key: str):
    """Client-input errors on this surface must be 400 invalid_argument,
    not a KeyError-shaped opaque 500."""
    if not isinstance(body, dict) or key not in body:
        raise InvalidArgumentError(f"Missing required field `{key}`")
    return body[key]


def _int_arg(body: dict, key: str, default: int) -> int:
    value = body.get(key, default)
    if value is None:
        return default
    try:
        return int(value)
    except (TypeError, ValueError):
        raise InvalidArgumentError(f"`{key}` must be an integer, got "
                                   f"{value!r}")


def _parse_mods(raw):
    if not raw:
        return None
    return [ScoreModifier(**m) for m in raw]


def _hit_json(hit) -> dict:
    return {
        "id": hit.doc_id,
        "score": hit.score,
        "fields": hit.fields,
        "highlight": hit.highlight,
        "raw_tensor_score": hit.raw_tensor_score,
        "raw_lexical_score": hit.raw_lexical_score,
    }


def build_engine_app(engine: StoreEngine):
    """Mount engine routes on our stdlib HTTP framework."""
    from marqo_tpu.api.http_framework import App, Request

    app = App(title="marqo-tpu-engine")

    from marqo_tpu.api import exceptions as api_exceptions
    from marqo_tpu.core.exceptions import EngineOutOfSpaceError
    app.map_exception(IndexExistsError,
                      lambda e: api_exceptions.IndexAlreadyExistsError(e.message))
    app.map_exception(IndexNotFoundError,
                      lambda e: api_exceptions.IndexNotFoundError(e.message))
    app.map_exception(InvalidArgumentError,
                      lambda e: api_exceptions.InvalidArgError(e.message))
    # feed-block → HTTP 507 (the status Vespa's feed API returns above its
    # resource limits; the API-side translate matrix maps it per document)
    app.map_exception(
        EngineOutOfSpaceError,
        lambda e: api_exceptions.MarqoWebError(
            e.message, code="engine_out_of_space", status_code=507))

    @app.get("/engine/health")
    def health(request: Request):
        from marqo_tpu.engine.resources import watcher
        w = watcher()
        blocked = w.feed_block_reason()
        return {"status": "yellow" if blocked else "green",
                "indexes": len(engine.list_indexes()),
                "memoryIsAvailable": w.memory_is_available(),
                "storageIsAvailable": w.storage_is_available(),
                "memoryUsedPercentage": round(
                    100.0 * w.memory_used_fraction(), 2),
                "storageUsedPercentage": round(
                    100.0 * w.disk_used_fraction(), 2),
                **({"feed_blocked": blocked} if blocked else {})}

    @app.post("/engine/indexes")
    def create_index(request: Request):
        if not isinstance(request.body, dict):
            raise InvalidArgumentError("Index descriptor body required")
        engine.create_index(IndexDescriptor.from_json(request.body))
        return {"acknowledged": True}

    @app.get("/engine/indexes")
    def list_indexes(request: Request):
        return {"indexes": engine.list_indexes()}

    @app.delete("/engine/indexes/{name}")
    def delete_index(request: Request):
        engine.delete_index(request.path_params["name"])
        return {"acknowledged": True}

    @app.post("/engine/indexes/{name}/update")
    def update_index(request: Request):
        if not isinstance(request.body, dict):
            raise InvalidArgumentError("Index descriptor body required")
        descriptor = IndexDescriptor.from_json(request.body)
        # REST parity: the path names the resource — a body naming a
        # DIFFERENT index (client bug, stale retry) must not silently
        # swap that other index's descriptor
        if descriptor.name != request.path_params["name"]:
            raise InvalidArgumentError(
                f"Descriptor name `{descriptor.name}` does not match the "
                f"path index `{request.path_params['name']}`")
        engine.update_index(descriptor)
        return {"acknowledged": True}

    @app.post("/engine/indexes/{name}/docs")
    def feed(request: Request):
        body = request.body
        doc_id = _require(body, "id")
        engine.feed(request.path_params["name"], doc_id,
                    body.get("fields", {}), body.get("tensors"))
        return {"id": doc_id, "status": 200}

    @app.get("/engine/indexes/{name}/docs/{doc_id}")
    def get_doc(request: Request):
        name = request.path_params["name"]
        doc_id = request.path_params["doc_id"]
        doc = engine.get(name, doc_id)
        if doc is None:
            from marqo_tpu.api.exceptions import DocumentNotFoundError
            raise DocumentNotFoundError(f"Document {doc_id} not found")
        result = {"id": doc_id, "fields": doc}
        if request.query_flag("tensors"):
            result["tensors"] = engine.get_tensors(name, doc_id)
        return result

    @app.post("/engine/indexes/{name}/docs/{doc_id}/update")
    def update_doc(request: Request):
        if not isinstance(request.body, dict) or \
                not isinstance(request.body.get("updates"), dict):
            raise InvalidArgumentError("Body must carry an `updates` object")
        found = engine.update(request.path_params["name"],
                              request.path_params["doc_id"],
                              request.body["updates"])
        return {"found": found}

    @app.delete("/engine/indexes/{name}/docs/{doc_id}")
    def delete_doc(request: Request):
        found = engine.delete(request.path_params["name"],
                              request.path_params["doc_id"])
        return {"found": found}

    @app.post("/engine/indexes/{name}/delete-all")
    def delete_all(request: Request):
        return {"deleted": engine.delete_all(request.path_params["name"])}

    @app.get("/engine/indexes/{name}/stats")
    def stats(request: Request):
        name = request.path_params["name"]
        return {"documents": engine.doc_count(name),
                "vectors": engine.vector_count(name)}

    @app.post("/engine/indexes/{name}/query")
    def query(request: Request):
        name = request.path_params["name"]
        body = request.body or {}
        qtype = body.get("type", "tensor")
        common = dict(
            limit=_int_arg(body, "limit", 10),
            offset=_int_arg(body, "offset", 0),
            search_filter=_parse_filter(body.get("filter")),
            attributes_to_retrieve=body.get("attributes_to_retrieve"),
            expose_facets=bool(body.get("expose_facets", False)),
        )
        if qtype == "tensor":
            res = engine.query_tensor(
                name, _require(body, "vector"),
                searchable_fields=body.get("searchable_fields"),
                score_modifiers=_parse_mods(body.get("score_modifiers")),
                ef_search=body.get("ef_search"),
                approximate=bool(body.get("approximate", True)), **common)
        elif qtype == "lexical":
            res = engine.query_lexical(
                name, body.get("or_phrases", []), body.get("and_phrases", []),
                searchable_fields=body.get("searchable_fields"),
                score_modifiers=_parse_mods(body.get("score_modifiers")),
                global_stats=body.get("global_stats"),
                **common)
        elif qtype == "hybrid":
            res = engine.query_hybrid(
                name, body.get("vector", []),
                body.get("or_phrases", []), body.get("and_phrases", []),
                retrieval_method=body.get("retrieval_method", "disjunction"),
                ranking_method=body.get("ranking_method", "rrf"),
                alpha=float(body.get("alpha", 0.5)),
                rrf_k=int(body.get("rrf_k", 60)),
                searchable_fields_tensor=body.get("searchable_fields_tensor"),
                searchable_fields_lexical=body.get("searchable_fields_lexical"),
                score_modifiers_tensor=_parse_mods(
                    body.get("score_modifiers_tensor")),
                score_modifiers_lexical=_parse_mods(
                    body.get("score_modifiers_lexical")),
                ef_search=body.get("ef_search"),
                approximate=bool(body.get("approximate", True)),
                global_stats=body.get("global_stats"), **common)
        else:
            raise InvalidArgumentError(f"Unknown query type `{qtype}`")
        return {"total": res.total, "hits": [_hit_json(h) for h in res.hits]}

    @app.post("/engine/indexes/{name}/lexical-stats")
    def lexical_stats(request: Request):
        """Per-field corpus statistics for the requested terms — fanned out
        by the cluster coordinator to score BM25 with global idf."""
        body = request.body or {}
        return engine.lexical_stats(
            request.path_params["name"], body.get("terms", []),
            searchable_fields=body.get("searchable_fields"))

    @app.get("/engine/indexes/{name}/dump")
    def dump_index(request: Request):
        """Full index state for replica anti-entropy (cluster heal)."""
        return engine.dump_index(request.path_params["name"])

    @app.get("/engine/indexes/{name}/digest")
    def index_digest(request: Request):
        return engine.index_digest(request.path_params["name"])

    @app.post("/engine/sync-from")
    def sync_from(request: Request):
        """Pull one index's state from a healthy peer engine and replace
        the local copy (reference role: Vespa's internal replica
        redistribution when a content node rejoins)."""
        # Trust model: like Vespa's content-node ports, this surface is an
        # INTERNAL unauthenticated API — deploy it on a private network.
        # Still: only http(s) source URLs, and the fetched dump must name
        # the index the caller asked to sync — a peer answering with a
        # different index's dump (or a spoofed body) must not silently
        # overwrite that other index.
        body = request.body or {}
        source_url = str(_require(body, "source_url")).rstrip("/")
        index_name = str(_require(body, "index_name"))
        if not source_url.startswith(("http://", "https://")):
            raise InvalidArgumentError(
                f"source_url must be http(s), got `{source_url}`")
        import httpx
        response = httpx.get(
            f"{source_url}/engine/indexes/{index_name}/dump", timeout=300.0)
        response.raise_for_status()
        dump = response.json()
        dump_name = (dump.get("descriptor") or {}).get("name")
        if dump_name != index_name:
            raise InvalidArgumentError(
                f"Peer dump names index `{dump_name}`, expected "
                f"`{index_name}` — refusing to overwrite")
        loaded = engine.load_index_dump(dump)
        logger.info(f"Synced index {index_name} from {source_url}: "
                    f"{loaded} docs")
        return {"synced_docs": loaded}

    # -- coordination: cross-replica DDL lock + admission control --------
    # (role of the reference's Zookeeper lock + Redis throttle; see
    # engine/coordination.py)
    from marqo_tpu.engine.coordination import Coordinator
    coordinator = Coordinator()

    @app.post("/engine/coordination/lock/acquire")
    def lock_acquire(request: Request):
        body = request.body or {}
        return {"acquired": coordinator.lock_acquire(
            str(body["name"]), str(body["owner"]),
            float(body.get("ttl", 120.0)))}

    @app.post("/engine/coordination/lock/release")
    def lock_release(request: Request):
        body = request.body or {}
        return {"released": coordinator.lock_release(
            str(body["name"]), str(body["owner"]))}

    @app.post("/engine/coordination/semaphore/acquire")
    def semaphore_acquire(request: Request):
        body = request.body or {}
        return {"acquired": coordinator.semaphore_acquire(
            str(body["name"]), str(body["owner"]),
            int(body["limit"]), float(body.get("ttl", 600.0)))}

    @app.post("/engine/coordination/semaphore/release")
    def semaphore_release(request: Request):
        body = request.body or {}
        return {"released": coordinator.semaphore_release(
            str(body["name"]), str(body["owner"]))}

    return app


def main(host: str = "0.0.0.0", port: int = 8080, n_shards: int = 1,
         data_dir: str = None):
    from marqo_tpu.api import configs
    from marqo_tpu.api.http_framework import serve
    engine = StoreEngine(n_shards=n_shards)
    # shard/cluster durability: the reference's external Vespa persists its
    # document store + transaction log; the standalone engine server does
    # the same (snapshots + WAL) when a data dir is configured
    data_dir = data_dir or configs.read_env_vars_and_defaults(
        "MARQO_ENGINE_DATA_DIR")
    if data_dir:
        from marqo_tpu.engine.wal import setup_engine_durability
        setup_engine_durability(engine, str(data_dir))
    serve(build_engine_app(engine), host=host, port=port)


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser(description="marqo-tpu engine server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--shards", type=int, default=1)
    parser.add_argument("--data-dir", default=None,
                        help="persistence root (snapshots + WAL)")
    args = parser.parse_args()
    main(args.host, args.port, args.shards, args.data_dir)
