"""Multi-worker API serving (MARQO_API_WORKERS / main(workers=N)):
SO_REUSEPORT process pool over a shared external engine, with DDL made by
one worker visible to the others via the settings store's disk reload."""

import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
API_PORT = 18850
ENGINE_PORT = 18851

WORKER_MAIN = f"""
import sys
sys.path.insert(0, {REPO!r})
import jax; jax.config.update("jax_platforms", "cpu")
from marqo_tpu.api.app import main
main(host="127.0.0.1", port={API_PORT}, workers=2)
"""


def _req(method, path, body=None, timeout=30):
    request = urllib.request.Request(
        f"http://127.0.0.1:{API_PORT}{path}", method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    return json.load(urllib.request.urlopen(request, timeout=timeout))


class TestMultiWorker:
    def test_two_workers_share_engine_and_settings(self, tmp_path):
        from marqo_tpu.api.http_framework import serve
        from marqo_tpu.engine.server import build_engine_app
        from marqo_tpu.engine.store import StoreEngine

        engine_server = serve(build_engine_app(StoreEngine()),
                              host="127.0.0.1", port=ENGINE_PORT,
                              background=True)
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            MARQO_ENGINE_QUERY_URL=f"http://127.0.0.1:{ENGINE_PORT}",
            MARQO_ENGINE_DATA_DIR=str(tmp_path),
            MARQO_COORDINATION_BACKEND="file",
            MARQO_COORDINATION_DIR=str(tmp_path / "coord"),
            MARQO_MODELS_TO_PRELOAD="[]")
        proc = subprocess.Popen([sys.executable, "-c", WORKER_MAIN], env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    _req("GET", "/health", timeout=5)
                    break
                except Exception:
                    time.sleep(1)
            else:
                pytest.fail("API workers did not come up")
            _req("POST", "/indexes/mwt", {"model": "random"})
            time.sleep(1.5)  # other worker's settings reload window
            out = _req("POST", "/indexes/mwt/documents",
                       {"documents": [{"_id": f"d{i}", "t": f"word {i}"}
                                      for i in range(5)],
                        "tensorFields": []})
            assert out["errors"] is False
            # kernel-balanced accepts: every request must see the index
            ok = 0
            for _ in range(20):
                result = _req("POST", "/indexes/mwt/search",
                              {"q": "word", "searchMethod": "LEXICAL",
                               "limit": 10})
                if len(result.get("hits", [])) == 5:
                    ok += 1
            assert ok == 20
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()
            engine_server.shutdown()

    def test_workers_require_external_engine(self, monkeypatch):
        from marqo_tpu.api.app import main
        from marqo_tpu.api.exceptions import StartupSanitationError
        monkeypatch.delenv("MARQO_ENGINE_QUERY_URL", raising=False)
        monkeypatch.delenv("MARQO_ENGINE_CLUSTER", raising=False)
        with pytest.raises(StartupSanitationError, match="external engine"):
            main(host="127.0.0.1", port=18860, workers=2)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
