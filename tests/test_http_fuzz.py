"""HTTP surface fuzzing: every route must answer malformed input with a
structured JSON error envelope (message/code/type), never an unhandled
crash, and the server must keep serving afterwards. Mirrors the
reference's error-envelope guarantee (api.py:88-141 exception handlers)."""

import json
import string
import urllib.error
import urllib.request

import numpy as np
import pytest

from marqo_tpu.api.app import build_app, generate_config, on_start
from marqo_tpu.api.http_framework import serve

GARBAGE_BODIES = [
    b"",                                  # empty body
    b"{ not json at all",                 # broken JSON
    b"[]",                                # wrong top-level type
    b'"just a string"',
    b"null",
    json.dumps({"unexpected": {"deeply": {"nested": ["x"] * 50}}}).encode(),
    json.dumps({"documents": "not-a-list"}).encode(),
    json.dumps({"q": {"dict": "not str"}, "limit": "NaN"}).encode(),
    json.dumps({"q": "x", "limit": -5}).encode(),
    json.dumps({"q": "x", "searchMethod": "TELEPATHY"}).encode(),
    json.dumps({"model": 42}).encode(),
    json.dumps({"q": "\x00\x01\ud800surrogate?"
                .encode("utf-8", "surrogatepass").decode("utf-8",
                                                         "replace")}).encode(),
    json.dumps({"q": "A" * 200_000}).encode(),  # oversized field
]


@pytest.fixture(scope="module")
def server():
    config = generate_config()
    on_start(config)
    app = build_app(config)
    srv = serve(app, host="127.0.0.1", port=0, background=True)
    port = srv.server_address[1]

    def req(method, path, raw_body=None, timeout=30):
        request = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", method=method, data=raw_body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(request, timeout=timeout) as resp:
                return resp.status, json.load(resp)
        except urllib.error.HTTPError as e:
            body = e.read().decode("utf-8", "replace")
            try:
                return e.code, json.loads(body)
            except json.JSONDecodeError:
                return e.code, {"_raw": body}

    # one healthy index for routes that need it
    status, _ = req("POST", "/indexes/fuzz-idx",
                    json.dumps({"model": "random"}).encode())
    assert status == 200
    yield req
    config.index_meta_cache.stop_refresh_thread()


def _assert_envelope(status, body, context):
    assert status < 500 or body.get("type") == "internal_error", context
    if status >= 400:
        assert isinstance(body, dict) and "message" in body, context
        assert "Traceback" not in json.dumps(body), context


class TestFuzzRoutes:
    ROUTES = [
        ("POST", "/indexes/fuzz-idx/search"),
        ("POST", "/indexes/fuzz-idx/documents"),
        ("POST", "/indexes/fuzz-idx/recommend"),
        ("POST", "/indexes/fuzz-idx/embed"),
        ("POST", "/indexes/fuzz-idx/documents/delete-batch"),
        ("PATCH", "/indexes/fuzz-idx/documents"),
        ("POST", "/indexes/another-idx"),
        ("POST", "/batch/indexes/delete"),
        ("POST", "/ops/heal"),
    ]

    @pytest.mark.parametrize("method,path", ROUTES)
    def test_garbage_bodies_never_crash(self, server, method, path):
        for raw in GARBAGE_BODIES:
            status, body = server(method, path, raw)
            _assert_envelope(status, body, (method, path, raw[:60]))
        # the server still works after the abuse
        status, body = server("GET", "/health")
        assert status == 200 and body["status"] == "green"

    def test_random_bytes_bodies(self, server):
        rng = np.random.default_rng(0)
        for _ in range(20):
            raw = bytes(rng.integers(0, 256, size=int(rng.integers(1, 400)),
                                     dtype=np.uint8))
            status, body = server("POST", "/indexes/fuzz-idx/search", raw)
            _assert_envelope(status, body, raw[:40])

    def test_random_json_shapes(self, server):
        rng = np.random.default_rng(1)

        def random_value(depth=0):
            kind = rng.integers(0, 6 if depth < 3 else 4)
            if kind == 0:
                return rng.integers(-10**9, 10**9).item()
            if kind == 1:
                return float(rng.standard_normal()) * 10**rng.integers(0, 9)
            if kind == 2:
                return "".join(rng.choice(list(string.printable), size=12))
            if kind == 3:
                return bool(rng.integers(0, 2))
            if kind == 4:
                return [random_value(depth + 1)
                        for _ in range(rng.integers(0, 4))]
            return {f"k{i}": random_value(depth + 1)
                    for i in range(rng.integers(0, 4))}

        keys = ["q", "limit", "offset", "searchMethod", "filter",
                "documents", "tensorFields", "mappings", "reRanker",
                "searchableAttributes", "scoreModifiers", "hybridParameters",
                "batchVectorisationMode", "modelAuth", "context"]
        for _ in range(40):
            body = {k: random_value() for k in
                    rng.choice(keys, size=rng.integers(1, 6), replace=False)}
            raw = json.dumps(body).encode()
            for path in ("/indexes/fuzz-idx/search",
                         "/indexes/fuzz-idx/documents"):
                status, out = server("POST", path, raw)
                _assert_envelope(status, out, (path, raw[:80]))

    def test_hostile_paths(self, server):
        for path in ("/indexes/%2e%2e%2f%2e%2e/search",
                     "/indexes//search",
                     "/indexes/fuzz-idx/documents/%00",
                     "/indexes/" + "x" * 3000,
                     "/indexes/fuzz-idx/documents/..%2f..%2fetc%2fpasswd"):
            status, body = server("GET", path)
            assert status in (200, 400, 404, 405), (path, status, body)
        status, body = server("GET", "/health")
        assert status == 200


def test_boost_param_rejected(server):
    """Reference 2.x boost status codes: TENSOR + boost → 500 (generic
    not-supported, tensor_search.py:2211); non-TENSOR + any boost → 400
    (validation.py:202-206)."""
    import json as _json
    status, body = server(
        "POST", "/indexes/fuzz-idx/search",
        _json.dumps({"q": "x", "boost": {"text": [5, 1]}}).encode())
    assert status == 500, body
    status, body = server(
        "POST", "/indexes/fuzz-idx/search",
        _json.dumps({"q": "x", "searchMethod": "LEXICAL",
                     "boost": {}}).encode())
    assert status == 400, body
    status, body = server(
        "POST", "/indexes/fuzz-idx/search",
        _json.dumps({"q": "x"}).encode())
    assert status == 200, body
