"""Serving-path hardening: HTTP framing, engine-server input validation,
client error translation (round-5 review findings).

Reference behaviors targeted:
  - FastAPI surfaces body-shape errors as 422 validation errors
    (api.py exception handlers), never TypeError-shaped 500s.
  - vespa_client treats backend 400s as client errors, not transport
    failures, and never retries deterministic errors across replicas.
  - A REST path names the resource; Vespa's document API rejects
    payloads addressing a different resource than the URL.
"""

import json
import socket

import pytest

from marqo_tpu.api.http_framework import App, Request, serve
from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.engine.client import EngineHTTPError, RemoteStoreEngine
from marqo_tpu.engine.descriptor import IndexDescriptor
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

BASE_PORT = 18800


@pytest.fixture(scope="module")
def engine_pair():
    engine = StoreEngine()
    engine.create_index(IndexDescriptor(name="sh-idx", model_dimensions=4))
    server = serve(build_engine_app(engine), host="127.0.0.1",
                   port=BASE_PORT, background=True)
    client = RemoteStoreEngine(f"http://127.0.0.1:{BASE_PORT}")
    yield engine, client
    client.close()
    server.shutdown()


def _raw_request(port: int, payload: bytes) -> bytes:
    with socket.create_connection(("127.0.0.1", port), timeout=10) as sock:
        sock.sendall(payload)
        sock.settimeout(10)
        data = b""
        try:
            while True:
                part = sock.recv(65536)
                if not part:
                    break
                data += part
                if b"\r\n\r\n" in data:
                    head, _, rest = data.partition(b"\r\n\r\n")
                    for line in head.split(b"\r\n"):
                        if line.lower().startswith(b"content-length:"):
                            want = int(line.split(b":")[1])
                            if len(rest) >= want:
                                return data
        except socket.timeout:
            pass
        return data


class TestHttpFraming:
    def test_malformed_content_length_is_400(self, engine_pair):
        raw = (b"POST /engine/indexes HTTP/1.1\r\n"
               b"Host: x\r\nContent-Length: abc\r\n\r\n")
        resp = _raw_request(BASE_PORT, raw)
        assert resp.startswith(b"HTTP/1.1 400")

    def test_negative_content_length_is_400_not_hang(self, engine_pair):
        raw = (b"POST /engine/indexes HTTP/1.1\r\n"
               b"Host: x\r\nContent-Length: -5\r\n\r\n")
        resp = _raw_request(BASE_PORT, raw)
        assert resp.startswith(b"HTTP/1.1 400")

    def test_chunked_body_is_decoded(self, engine_pair):
        engine, _ = engine_pair
        body = json.dumps({"name": "chunked-idx",
                           "model_dimensions": 4}).encode()
        mid = len(body) // 2
        chunked = (b"%x\r\n%s\r\n%x\r\n%s\r\n0\r\n\r\n"
                   % (mid, body[:mid], len(body) - mid, body[mid:]))
        raw = (b"POST /engine/indexes HTTP/1.1\r\nHost: x\r\n"
               b"Content-Type: application/json\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n" + chunked)
        resp = _raw_request(BASE_PORT, raw)
        assert b"200" in resp.split(b"\r\n", 1)[0]
        assert engine.has_index("chunked-idx")


class TestBodyShape422:
    @pytest.fixture(scope="class")
    def api_port(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from marqo_tpu.api.app import build_app, generate_config
        config = generate_config()
        app = build_app(config)
        server = serve(app, host="127.0.0.1", port=BASE_PORT + 1,
                       background=True)
        yield BASE_PORT + 1
        server.shutdown()

    def test_json_array_body_is_422_not_500(self, api_port):
        import httpx
        resp = httpx.post(
            f"http://127.0.0.1:{api_port}/indexes/nope/search",
            json=[1, 2, 3])
        assert resp.status_code == 422
        assert "dictionary" in resp.json()["message"]


class TestEngineServerInputValidation:
    def test_query_without_vector_is_400(self, engine_pair):
        import httpx
        resp = httpx.post(
            f"http://127.0.0.1:{BASE_PORT}/engine/indexes/sh-idx/query",
            json={"type": "tensor"})
        assert resp.status_code == 400
        assert "vector" in resp.json()["message"]

    def test_null_limit_is_defaulted_bad_limit_is_400(self, engine_pair):
        import httpx
        ok = httpx.post(
            f"http://127.0.0.1:{BASE_PORT}/engine/indexes/sh-idx/query",
            json={"type": "tensor", "vector": [0.1] * 4, "limit": None})
        assert ok.status_code == 200
        bad = httpx.post(
            f"http://127.0.0.1:{BASE_PORT}/engine/indexes/sh-idx/query",
            json={"type": "tensor", "vector": [0.1] * 4, "limit": "ten"})
        assert bad.status_code == 400

    def test_feed_without_id_is_400(self, engine_pair):
        import httpx
        resp = httpx.post(
            f"http://127.0.0.1:{BASE_PORT}/engine/indexes/sh-idx/docs",
            json={"fields": {"a": 1}})
        assert resp.status_code == 400

    def test_update_name_mismatch_is_400(self, engine_pair):
        engine, client = engine_pair
        import httpx
        other = IndexDescriptor(name="other-idx", model_dimensions=4)
        resp = httpx.post(
            f"http://127.0.0.1:{BASE_PORT}/engine/indexes/sh-idx/update",
            json=other.to_json())
        assert resp.status_code == 400
        assert "does not match" in resp.json()["message"]

    def test_sync_from_rejects_non_http_source(self, engine_pair):
        import httpx
        resp = httpx.post(
            f"http://127.0.0.1:{BASE_PORT}/engine/sync-from",
            json={"source_url": "file:///etc", "index_name": "sh-idx"})
        assert resp.status_code == 400

    def test_sync_from_rejects_mismatched_dump(self, engine_pair):
        """A peer answering with a DIFFERENT index's dump must not
        silently overwrite that other index."""
        import httpx
        evil = App(title="evil-peer")

        @evil.get("/engine/indexes/{name}/dump")
        def dump(request: Request):
            return {"descriptor": IndexDescriptor(
                name="not-what-you-asked", model_dimensions=4).to_json(),
                "docs": [], "version": 99}

        peer = serve(evil, host="127.0.0.1", port=BASE_PORT + 2,
                     background=True)
        try:
            resp = httpx.post(
                f"http://127.0.0.1:{BASE_PORT}/engine/sync-from",
                json={"source_url": f"http://127.0.0.1:{BASE_PORT + 2}",
                      "index_name": "sh-idx"}, timeout=30)
            assert resp.status_code == 400
            assert "refusing" in resp.json()["message"]
        finally:
            peer.shutdown()


class TestClientErrorTranslation:
    def test_engine_400_query_raises_invalid_argument(self, engine_pair):
        _, client = engine_pair
        with pytest.raises(InvalidArgumentError):
            client._query("sh-idx", {"type": "nonsense"})

    def test_html_404_raises_instead_of_empty_success(self):
        plain = App(title="proxy-404")
        server = serve(plain, host="127.0.0.1", port=BASE_PORT + 3,
                       background=True)
        # the framework's own 404 is JSON with code=route_not_found-style
        # content; simulate a proxy HTML 404 with a raw responder instead
        server.shutdown()
        import http.server
        import threading

        class Html404(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body = b"<html>404 not found</html>"
                self.send_response(404)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", BASE_PORT + 4), Html404)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        client = RemoteStoreEngine(f"http://127.0.0.1:{BASE_PORT + 4}")
        try:
            with pytest.raises(EngineHTTPError):
                client.get("whatever", "doc1")
        finally:
            client.close()
            httpd.shutdown()

    def test_feed_batch_reuses_executor(self, engine_pair):
        _, client = engine_pair
        client.feed_batch("sh-idx", [
            {"id": "e1", "fields": {"n": 1}, "tensors": {}}])
        first = client._executor
        client.feed_batch("sh-idx", [
            {"id": "e2", "fields": {"n": 2}, "tensors": {}}])
        assert client._executor is first
        assert first is not None
