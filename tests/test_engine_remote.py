"""Remote engine transport: shard server + client over real HTTP, and the
full API stack running against a remote engine."""

import numpy as np
import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.core.search.search_filter import MarqoFilterStringParser
from marqo_tpu.engine.client import RemoteStoreEngine
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

PORT = 18080


@pytest.fixture(scope="module")
def remote():
    backend = StoreEngine(n_shards=2)
    server = serve(build_engine_app(backend), host="127.0.0.1", port=PORT,
                   background=True)
    client = RemoteStoreEngine(f"http://127.0.0.1:{PORT}")
    yield client
    client.close()
    server.shutdown()


def _unit(v):
    v = np.asarray(v, dtype=np.float32)
    return (v / np.linalg.norm(v)).tolist()


class TestRemoteEngine:
    def test_ddl_roundtrip(self, remote):
        remote.create_index(IndexDescriptor(name="r-idx", model_dimensions=4))
        assert remote.has_index("r-idx")
        from marqo_tpu.core.exceptions import IndexExistsError
        with pytest.raises(IndexExistsError):
            remote.create_index(IndexDescriptor(name="r-idx",
                                                model_dimensions=4))

    def test_feed_get_query(self, remote):
        remote.feed("r-idx", "a", {"title": "red apple", "price": 5},
                    {"title": {"chunks": ["red apple"],
                               "embeddings": [_unit([1, 0, 0, 0])]}})
        remote.feed("r-idx", "b", {"title": "green pear", "price": 10},
                    {"title": {"chunks": ["green pear"],
                               "embeddings": [_unit([0, 1, 0, 0])]}})
        assert remote.doc_count("r-idx") == 2
        assert remote.get("r-idx", "a")["title"] == "red apple"
        assert remote.get("r-idx", "missing") is None

        res = remote.query_tensor("r-idx", _unit([1, 0, 0, 0]), limit=2)
        assert res.hits[0].doc_id == "a"
        assert res.hits[0].highlight == {"title": "red apple"}

        res = remote.query_lexical("r-idx", ["pear"], [], limit=5)
        assert res.hits[0].doc_id == "b"

        res = remote.query_hybrid("r-idx", _unit([1, 0, 0, 0]),
                                  ["red"], [], limit=5)
        assert res.hits[0].doc_id == "a"

    def test_filter_over_wire(self, remote):
        f = MarqoFilterStringParser().parse("price:[6 TO 20]")
        res = remote.query_tensor("r-idx", _unit([1, 0, 0, 0]), limit=5,
                                  search_filter=f)
        assert [h.doc_id for h in res.hits] == ["b"]

    def test_tensors_roundtrip(self, remote):
        tensors = remote.get_tensors("r-idx", "a")
        assert tensors["title"][0]["chunk"] == "red apple"
        assert len(tensors["title"][0]["embedding"]) == 4

    def test_feed_batch_concurrent(self, remote):
        # self-sufficient: -k subsets may skip the DDL/feed tests above
        if not remote.has_index("r-idx"):
            remote.create_index(IndexDescriptor(name="r-idx",
                                                model_dimensions=4))
        docs = [{"id": f"batch{i}", "fields": {"n": i}} for i in range(20)]
        results = remote.feed_batch("r-idx", docs)
        assert all(r["status"] == 200 for r in results)
        assert remote.doc_count("r-idx") >= 20

    def test_delete(self, remote):
        assert remote.delete("r-idx", "batch0") is True
        assert remote.delete("r-idx", "batch0") is False


class TestFullStackOverRemoteEngine:
    def test_search_through_remote_engine(self, remote, monkeypatch):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.inference import vectorise as inference
        from marqo_tpu.tensor_search import tensor_search

        inference.clear_loaded_models()
        cfg = Config(engine=remote)
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("remote-full"))
        cfg.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="remote-full",
            docs=[{"_id": "1", "text": "hello world"},
                  {"_id": "2", "text": "goodbye moon"}],
            tensor_fields=["text"]))
        assert res["errors"] is False, res["items"]
        out = tensor_search.search(cfg, "remote-full", text="hello world")
        assert out["hits"][0]["_id"] == "1"
        inference.clear_loaded_models()


class TestSearchTimeout:
    """MARQO_SEARCH_TIMEOUT_MS enforced per engine query (reference
    vespa_client.py:229 sets query timeout on every Vespa search)."""

    def test_slow_engine_query_times_out(self, monkeypatch):
        import threading
        import time as _time
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from marqo_tpu.core.exceptions import BackendTimeoutError
        from marqo_tpu.engine.client import RemoteStoreEngine

        class SlowEngine(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path.endswith("/query"):
                    _time.sleep(1.0)  # exceeds the 200ms deadline below
                self.send_response(200)
                body = b'{"total": 0, "hits": []}'
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        server = ThreadingHTTPServer(("127.0.0.1", 0), SlowEngine)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        monkeypatch.setenv("MARQO_SEARCH_TIMEOUT_MS", "200")
        engine = RemoteStoreEngine(
            f"http://127.0.0.1:{server.server_address[1]}")
        start = _time.monotonic()
        with pytest.raises(BackendTimeoutError, match="200ms"):
            engine.query_lexical("x", ["a"], [], limit=5)
        assert _time.monotonic() - start < 0.9  # aborted before the 1s sleep
        server.shutdown()


class TestDocumentResponseTranslation:
    """Ported reference tests/vespa/test_vespa_client.py:433-464 —
    engine-shard HTTP status -> per-document API (status, message)."""

    CASES = [
        (200, None, 200, None),
        (404, None, 404, "Document does not exist in the index"),
        (412, None, 404, "Document does not exist in the index"),
        (429, None, 429, "Marqo vector store receives too many requests. "
                         "Please try again later"),
        (507, None, 400, "Marqo vector store is out of memory or disk "
                         "space"),
        (123, None, 500, "Marqo vector store returns an unexpected error "
                         "with this document"),
        (400, None, 500, "Marqo vector store returns an unexpected error "
                         "with this document"),
        (400, "could not parse field", 400,
         "The document contains invalid characters in the fields. "
         "Original error: could not parse field"),
    ]

    def test_translate_engine_document_response_status(self):
        from marqo_tpu.engine.client import \
            translate_engine_document_response
        for status, message, want_status, want_message in self.CASES:
            got_status, got_message = translate_engine_document_response(
                status, message)
            assert got_status == want_status, (status, message)
            if want_message:
                assert want_message in got_message, (status, message)

    def test_translate_engine_document_response_logging(self, monkeypatch):
        """Unexpected statuses log an error once (reference :458-463)."""
        import marqo_tpu.engine.client as client_mod
        calls = []
        monkeypatch.setattr(client_mod.logger, "error",
                            lambda *a, **k: calls.append(a))
        client_mod.translate_engine_document_response(400, None)
        assert len(calls) == 1

    def test_feed_batch_translates_shard_statuses(self, monkeypatch):
        """A shard 507 surfaces as a per-doc 400 out-of-space item, not a
        batch failure."""
        from marqo_tpu.engine.client import (EngineHTTPError,
                                             RemoteStoreEngine)
        engine = RemoteStoreEngine("http://127.0.0.1:1")

        def fake_feed(index_name, doc_id, fields, tensors=None):
            if doc_id == "full":
                raise EngineHTTPError(507, "disk full")

        monkeypatch.setattr(engine, "feed", fake_feed)
        results = engine.feed_batch("idx", [
            {"id": "ok", "fields": {}},
            {"id": "full", "fields": {}},
        ])
        assert results[0]["status"] == 200
        assert results[1]["status"] == 400
        assert "out of memory or disk space" in results[1]["message"]

    def test_add_documents_path_translates_shard_statuses(self,
                                                          monkeypatch):
        """The REAL ingest path (AddDocumentsHandler._feed_plans ->
        engine.feed) must apply the same translation: a shard 507
        becomes a per-item 400 out-of-space error, not a generic 500."""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.engine.client import EngineHTTPError
        from marqo_tpu.inference import vectorise as inference
        from marqo_tpu.tensor_search import tensor_search
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("shard-status-ix"))
        cfg.index_meta_cache.populate()

        real_feed = cfg.engine.feed

        def feed(schema, doc_id, fields, tensors=None):
            if doc_id == "full":
                raise EngineHTTPError(507, "disk full")
            return real_feed(schema, doc_id, fields, tensors)

        monkeypatch.setattr(cfg.engine, "feed", feed)
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="shard-status-ix",
            docs=[{"_id": "ok", "t": "fine"}, {"_id": "full", "t": "big"}],
            tensor_fields=["t"]))
        items = {i["_id"]: i for i in res["items"]}
        assert items["ok"]["status"] == 200
        assert items["full"]["status"] == 400
        assert "out of memory or disk space" in items["full"]["error"]
        inference.clear_loaded_models()


class TestLocalRemoteParityFuzz:
    """Property check: the SAME randomized feed/get/delete/query sequence
    against the in-process StoreEngine and through the HTTP shard
    transport must produce identical outcomes (role of the reference's
    pyvespa-vs-VespaClient equivalence)."""

    def test_randomized_sequence_parity(self, remote):
        import random

        from marqo_tpu.engine.descriptor import IndexDescriptor
        rng = random.Random(42)
        local = StoreEngine(n_shards=2)
        local.create_index(IndexDescriptor(name="fuzz-par",
                                           model_dimensions=8))
        remote.create_index(IndexDescriptor(name="fuzz-par-remote",
                                            model_dimensions=8))

        ids = [f"d{i}" for i in range(30)]
        for step in range(120):
            op = rng.choice(["feed", "get", "delete", "query", "count"])
            doc_id = rng.choice(ids)
            if op == "feed":
                vec = _unit([rng.uniform(-1, 1) for _ in range(8)])
                fields = {"n": rng.randint(0, 9), "t": f"word{step % 7}"}
                tensors = {"t": {"chunks": [fields["t"]],
                                 "embeddings": [vec]}}
                local.feed("fuzz-par", doc_id, dict(fields), tensors)
                remote.feed("fuzz-par-remote", doc_id, dict(fields),
                            tensors)
            elif op == "get":
                a = local.get("fuzz-par", doc_id)
                b = remote.get("fuzz-par-remote", doc_id)
                assert a == b, (step, doc_id, a, b)
            elif op == "delete":
                a = local.delete("fuzz-par", doc_id)
                b = remote.delete("fuzz-par-remote", doc_id)
                assert a == b, (step, doc_id)
            elif op == "count":
                assert local.doc_count("fuzz-par") == \
                    remote.doc_count("fuzz-par-remote"), step
            else:
                qv = _unit([rng.uniform(-1, 1) for _ in range(8)])
                ra = local.query_tensor("fuzz-par", qv, limit=5)
                rb = remote.query_tensor("fuzz-par-remote", qv, limit=5)
                assert [h.doc_id for h in ra.hits] == \
                    [h.doc_id for h in rb.hits], step
                for ha, hb in zip(ra.hits, rb.hits):
                    assert abs(ha.score - hb.score) < 1e-5, step
