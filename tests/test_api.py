"""HTTP API tests: routes, error envelopes, telemetry, full request cycle.

Most tests exercise App.dispatch directly (no sockets); one test boots the
real threaded server and talks HTTP through httpx.
"""

import json

import pytest

from marqo_tpu.api.app import build_app, on_start
from marqo_tpu.config import Config
from marqo_tpu.inference import vectorise as inference


class Client:
    """Tiny in-process test client over App.dispatch."""

    def __init__(self, app):
        self.app = app

    def request(self, method, path, body=None):
        payload = json.dumps(body).encode() if body is not None else b""
        response = self.app.dispatch(method, path, payload, {})
        return response.status, response.body

    def get(self, path):
        return self.request("GET", path)

    def post(self, path, body=None):
        return self.request("POST", path, body)

    def patch(self, path, body=None):
        return self.request("PATCH", path, body)

    def delete(self, path, body=None):
        return self.request("DELETE", path, body)


@pytest.fixture
def client(monkeypatch):
    monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[]")
    inference.clear_loaded_models()
    config = Config()
    on_start(config)
    app = build_app(config)
    c = Client(app)
    status, _ = c.post("/indexes/test-index", {"model": "test"})
    assert status == 200
    yield c
    config.index_meta_cache.stop_refresh_thread()
    inference.clear_loaded_models()


def _add_docs(client, docs=None):
    docs = docs or [
        {"_id": "d1", "title": "red apple", "desc": "a tasty red fruit"},
        {"_id": "d2", "title": "green pear", "desc": "a green fruit"},
    ]
    return client.post("/indexes/test-index/documents",
                       {"documents": docs, "tensorFields": ["title", "desc"]})


class TestRootAndHealth:
    def test_root(self, client):
        status, body = client.get("/")
        assert status == 200
        assert "Welcome to Marqo" in body["message"]

    def test_health(self, client):
        status, body = client.get("/health")
        assert status == 200
        assert body["status"] == "green"
        assert body["backend"]["status"] == "green"

    def test_index_health(self, client):
        status, body = client.get("/indexes/test-index/health")
        assert status == 200

    def test_unknown_path_404(self, client):
        status, body = client.get("/nope/nothing")
        assert status == 404

    def test_wrong_method_405(self, client):
        status, _ = client.patch("/health")
        assert status == 405


class TestIndexRoutes:
    def test_create_duplicate_409(self, client):
        status, body = client.post("/indexes/test-index", {"model": "test"})
        assert status == 409
        assert body["code"] == "index_already_exists"
        assert set(body) == {"message", "code", "type", "link"}

    def test_invalid_settings_422_envelope(self, client):
        status, body = client.post("/indexes/bad-index",
                                   {"model": "test", "bogusKey": 1})
        assert status == 422
        assert body["type"] == "invalid_request"

    def test_get_indexes(self, client):
        status, body = client.get("/indexes")
        assert status == 200
        assert {"indexName": "test-index"} in body["results"]

    def test_get_settings(self, client):
        status, body = client.get("/indexes/test-index/settings")
        assert status == 200
        assert body["model"] == "test"
        # semi-structured is internal; the API reports "unstructured"
        # (reference index_settings.py:202-206)
        assert body["type"] == "unstructured"
        assert body["annParameters"]["spaceType"] == "prenormalized-angular"

    def test_delete_index(self, client):
        client.post("/indexes/tmp-index", {"model": "test"})
        status, _ = client.delete("/indexes/tmp-index")
        assert status == 200
        status, body = client.delete("/indexes/tmp-index")
        assert status == 404
        assert body["code"] == "index_not_found"

    def test_validate_settings(self, client, monkeypatch):
        # gated behind MARQO_ENABLE_OPS_API (reference api.py:240-243)
        status, _ = client.post("/validate/index/any",
                                {"model": "hf/e5-base-v2"})
        assert status == 403
        monkeypatch.setenv("MARQO_ENABLE_OPS_API", "TRUE")
        status, body = client.post("/validate/index/any",
                                   {"model": "hf/e5-base-v2"})
        assert status == 200 and body["validated"] is True


class TestDocumentRoutes:
    def test_add_documents(self, client):
        status, body = _add_docs(client)
        assert status == 200
        assert body["errors"] is False
        assert len(body["items"]) == 2

    def test_get_document(self, client):
        _add_docs(client)
        status, body = client.get("/indexes/test-index/documents/d1")
        assert status == 200
        assert body["title"] == "red apple"

    def test_get_document_missing_404(self, client):
        status, body = client.get("/indexes/test-index/documents/nope")
        assert status == 404
        assert body["code"] == "document_not_found"

    def test_get_documents_batch(self, client):
        _add_docs(client)
        status, body = client.request("GET", "/indexes/test-index/documents",
                                      ["d1", "d2", "zzz"])
        assert status == 200
        found = [r["_found"] for r in body["results"]]
        assert found == [True, True, False]

    def test_delete_batch(self, client):
        _add_docs(client)
        status, body = client.post(
            "/indexes/test-index/documents/delete-batch", ["d1"])
        assert status == 200
        assert body["details"]["deletedDocuments"] == 1

    def test_stats(self, client):
        _add_docs(client)
        status, body = client.get("/indexes/test-index/stats")
        assert status == 200
        assert body["numberOfDocuments"] == 2
        assert body["numberOfVectors"] >= 2


class TestSearchRoutes:
    def test_tensor_search(self, client):
        _add_docs(client)
        status, body = client.post("/indexes/test-index/search",
                                   {"q": "red apple"})
        assert status == 200
        assert body["hits"][0]["_id"] == "d1"
        assert "processingTimeMs" in body

    def test_lexical_search(self, client):
        _add_docs(client)
        status, body = client.post(
            "/indexes/test-index/search",
            {"q": "pear", "searchMethod": "LEXICAL"})
        assert status == 200
        assert body["hits"][0]["_id"] == "d2"

    def test_hybrid_search(self, client):
        _add_docs(client)
        status, body = client.post(
            "/indexes/test-index/search",
            {"q": "red apple", "searchMethod": "HYBRID"})
        assert status == 200
        assert len(body["hits"]) > 0

    def test_search_missing_query_422(self, client):
        status, body = client.post("/indexes/test-index/search", {})
        assert status == 422

    def test_custom_vector_query(self, client):
        _add_docs(client)
        vec = [1.0] + [0.0] * 15
        status, body = client.post(
            "/indexes/test-index/search",
            {"q": {"customVector": {"vector": vec}}})
        assert status == 200

    def test_telemetry_injection(self, client):
        _add_docs(client)
        status, body = client.request(
            "POST", "/indexes/test-index/search?telemetry=true",
            {"q": "apple"})
        assert status == 200
        assert "telemetry" in body
        assert "timesMs" in body["telemetry"]

    def test_embed(self, client):
        status, body = client.post("/indexes/test-index/embed",
                                   {"content": "hello world"})
        assert status == 200
        assert len(body["embeddings"]) == 1
        assert len(body["embeddings"][0]) == 16

    def test_recommend(self, client):
        _add_docs(client)
        status, body = client.post(
            "/indexes/test-index/recommend",
            {"documents": ["d1"], "limit": 5})
        assert status == 200
        ids = [h["_id"] for h in body["hits"]]
        assert "d1" not in ids  # input excluded
        assert "d2" in ids


class TestModelRoutes:
    def test_loaded_models(self, client):
        _add_docs(client)
        status, body = client.get("/models")
        assert status == 200
        assert any(m["model_name"] == "test" for m in body["models"])

    def test_eject_model(self, client):
        _add_docs(client)
        status, body = client.delete(
            "/models?model_name=test&model_device=cpu")
        assert status == 200

    def test_eject_missing_404(self, client):
        status, body = client.delete(
            "/models?model_name=never&model_device=cpu")
        assert status == 404

    def test_cpu_info(self, client):
        status, body = client.get("/device/cpu")
        assert status == 200
        assert "memory_used_percent" in body


class TestFeatureGates:
    def test_batch_apis_gated(self, client):
        status, body = client.post("/batch/indexes/delete", ["x"])
        assert status == 403

    def test_batch_apis_enabled(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_BATCH_APIS", "TRUE")
        client.post("/indexes/b1", {"model": "test"})
        status, body = client.post("/batch/indexes/delete", ["b1"])
        assert status == 200


class TestRealHTTPServer:
    def test_over_http(self, monkeypatch):
        import httpx
        from marqo_tpu.api.http_framework import serve
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[]")
        config = Config()
        on_start(config)
        app = build_app(config)
        server = serve(app, host="127.0.0.1", port=18882, background=True)
        try:
            base = "http://127.0.0.1:18882"
            r = httpx.get(f"{base}/health")
            assert r.status_code == 200
            r = httpx.post(f"{base}/indexes/http-index",
                           json={"model": "test"})
            assert r.status_code == 200
            r = httpx.post(
                f"{base}/indexes/http-index/documents",
                json={"documents": [{"_id": "a", "text": "hello world"}],
                      "tensorFields": ["text"]})
            assert r.status_code == 200, r.text
            r = httpx.post(f"{base}/indexes/http-index/search",
                           json={"q": "hello"})
            assert r.status_code == 200
            assert r.json()["hits"][0]["_id"] == "a"
        finally:
            server.shutdown()
            config.index_meta_cache.stop_refresh_thread()


class TestSpecialCharacterIds:
    def test_doc_id_with_spaces_over_http(self, client):
        status, body = client.post(
            "/indexes/test-index/documents",
            {"documents": [{"_id": "doc with spaces", "title": "spaced"}],
             "tensorFields": ["title"]})
        assert status == 200 and body["errors"] is False
        status, body = client.get(
            "/indexes/test-index/documents/doc%20with%20spaces")
        assert status == 200
        assert body["title"] == "spaced"


class TestPartialUpdateRoute:
    def test_patch_documents_structured(self, monkeypatch):
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[]")
        inference.clear_loaded_models()
        config = Config()
        on_start(config)
        app = build_app(config)
        c = Client(app)
        status, _ = c.post("/indexes/patch-index", {
            "type": "structured", "model": "test",
            "allFields": [
                {"name": "title", "type": "text",
                 "features": ["lexical_search"]},
                {"name": "stock", "type": "int", "features": ["filter"]},
            ],
            "tensorFields": ["title"]})
        assert status == 200
        status, body = c.post("/indexes/patch-index/documents", {
            "documents": [{"_id": "p1", "title": "widget", "stock": 5}]})
        assert status == 200 and body["errors"] is False
        status, body = c.patch("/indexes/patch-index/documents", {
            "documents": [{"_id": "p1", "stock": 7}]})
        assert status == 200
        assert body["errors"] is False, body["items"]
        status, body = c.get("/indexes/patch-index/documents/p1")
        assert body["stock"] == 7 and body["title"] == "widget"
        config.index_meta_cache.stop_refresh_thread()
        inference.clear_loaded_models()

    def test_patch_unstructured_rejected(self, client):
        status, body = client.patch("/indexes/test-index/documents", {
            "documents": [{"_id": "x", "n": 1}]})
        assert status == 400


class TestOpsRoutes:
    def test_memory_gated_then_enabled(self, client, monkeypatch):
        status, _ = client.get("/memory")
        assert status == 403
        monkeypatch.setenv("MARQO_ENABLE_DEBUG_API", "TRUE")
        status, body = client.get("/memory")
        assert status == 200
        assert "memory_used" in body and "stats" in body

    def test_healthz(self, client):
        status, body = client.get("/healthz")
        assert status == 200 and body["status"] == "green"

    def test_settings_history_404_for_missing_index(self, client):
        status, _ = client.get("/indexes/ghost/settings/history")
        assert status == 404

    def test_upgrade_rollback_gated(self, client, monkeypatch):
        assert client.post("/upgrade")[0] == 403
        assert client.post("/rollback", {"indexName": "test-index"})[0] == 403
        monkeypatch.setenv("MARQO_ENABLE_UPGRADE_API", "TRUE")
        status, body = client.post("/upgrade")
        assert status == 200
        # rollback needs settings history; fresh index has none → 500 mapped
        status, body = client.post("/rollback", {"indexName": "test-index"})
        assert status in (200, 500)

    def test_upgrade_route_runs_migration(self, monkeypatch):
        """Route-driven migration: a persisted 2.12-shape settings doc is
        upgraded by POST /upgrade, and POST /rollback-vespa restores the
        pre-upgrade application backup (reference api.py:493-515)."""
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.version import __version__
        monkeypatch.setenv("MARQO_ENABLE_UPGRADE_API", "TRUE")
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[]")
        cfg = Config()
        on_start(cfg)
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("old-index"))
        store = cfg.index_management.settings_store
        # age the persisted state back to 2.12
        doc = json.loads(store.get("old-index").model_dump_json())
        doc["marqo_version"] = "2.12.0"
        doc.pop("video_preprocessing", None)
        doc.pop("audio_preprocessing", None)
        store._settings["old-index"] = doc
        store.set_marqo_version("2.12.0")
        c = Client(build_app(cfg))
        try:
            status, body = c.post("/upgrade")
            assert status == 200
            assert body["migrated"] == 1
            assert body["from"] == "2.12" and body["to"] == "2.13"
            assert store.get_marqo_version() == __version__
            assert store.get("old-index").marqo_version == __version__
            # idempotent: a second call reports no pending migrations
            status, body = c.post("/upgrade")
            assert status == 200
            assert body["migrated"] == 0
            assert body["message"] == "No migrations pending"
            # rollback-vespa restores the pre-upgrade snapshot
            status, body = c.post("/rollback-vespa")
            assert status == 200
            assert body["version"] == "2.12.0"
            assert store.get("old-index").marqo_version == "2.12.0"
        finally:
            cfg.index_meta_cache.stop_refresh_thread()

    def test_rollback_vespa_without_backup_errors(self, client):
        status, body = client.post("/rollback-vespa")
        assert status == 500

    def test_batch_create_indexes(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_BATCH_APIS", "TRUE")
        status, body = client.post("/batch/indexes/create", [
            {"indexName": "bc1", "model": "random"},
            {"indexName": "bc2", "model": "random"},
        ])
        assert status == 200
        status, body = client.get("/indexes")
        names = {r["indexName"] for r in body["results"]}
        assert {"bc1", "bc2"} <= names
        status, _ = client.post("/batch/indexes/delete", ["bc1", "bc2"])
        assert status == 200
