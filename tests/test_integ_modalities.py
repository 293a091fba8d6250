"""Port: modality download/dispatch behaviors.

Source: /root/reference/tests/tensor_search/test_modalities_download.py
(14 functions over the reference's threaded_download_and_preprocess_content;
the ffmpeg-specific error cases are environment-blocked — no ffmpeg binary
— and their WAV/cv2 alternates are covered in tests/test_audio_e2e.py).
This port asserts the same behaviors through marqo_tpu's downloader and
the add-documents path: per-pointer success/error maps, pointer dedup,
corrupt-image isolation, and unsupported-modality rejection.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from PIL import Image

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.types import Modality
from marqo_tpu.tensor_search import tensor_search
from marqo_tpu.tensor_search.add_docs import \
    threaded_download_and_preprocess_content


class _MediaServer(BaseHTTPRequestHandler):
    hits = []

    def do_GET(self):
        type(self).hits.append(self.path)
        if self.path.endswith("corrupt.jpg"):
            body = b"not-actually-an-image"
        elif self.path.endswith(".png"):
            import io
            buf = io.BytesIO()
            Image.new("RGB", (32, 32), color=(10, 200, 30)).save(
                buf, format="PNG")
            body = buf.getvalue()
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


@pytest.fixture
def media_server():
    _MediaServer.hits = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MediaServer)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


class TestThreadedDownload:
    """reference test_modalities_download.py:56-96, 161-178, 336-377"""

    def test_image_download_success(self, media_server):
        url = f"{media_server}/img.png"
        results, errors = threaded_download_and_preprocess_content(
            [url], modality=Modality.IMAGE)
        assert url in results
        assert errors == {}

    def test_image_load_error(self, media_server):
        # corrupt bytes → per-pointer error, not an exception
        url = f"{media_server}/corrupt.jpg"
        results, errors = threaded_download_and_preprocess_content(
            [url], modality=Modality.IMAGE)
        assert url not in results
        assert url in errors

    def test_media_download_error(self):
        url = "http://127.0.0.1:1/unreachable.png"
        results, errors = threaded_download_and_preprocess_content(
            [url], modality=Modality.IMAGE)
        assert url in errors

    def test_duplicate_pointers_fetched_once(self, media_server):
        url = f"{media_server}/img.png"
        results, errors = threaded_download_and_preprocess_content(
            [url, url, url], modality=Modality.IMAGE)
        assert url in results
        assert _MediaServer.hits.count("/img.png") == 1

    def test_mixed_success_and_error(self, media_server):
        good = f"{media_server}/img.png"
        bad = f"{media_server}/corrupt.jpg"
        results, errors = threaded_download_and_preprocess_content(
            [good, bad], modality=Modality.IMAGE)
        assert good in results and bad in errors


class TestUnsupportedModality:
    """reference test_modalities_download.py:143-159, 379-401 — media
    pointers whose modality the index model cannot embed fail their
    document with a does-not-support error."""

    def test_audio_with_image_only_model(self, media_server):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="clip-img-only",
            modelProperties={"type": "clip", "dimensions": 16,
                             "random_init": True, "image_size": 32,
                             "architecture": {"patch_size": 16}},
            treatUrlsAndPointersAsImages=True,
            treatUrlsAndPointersAsMedia=True).to_marqo_index("mod-index"))
        cfg.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="mod-index",
            docs=[{"_id": "a", "audio_field":
                   "https://example.com/file.mp3"}],
            tensor_fields=["audio_field"]))
        assert res["errors"] is True
        err = res["items"][0]["error"].lower()
        assert "does not support" in err or "audio" in err, err
        inference.clear_loaded_models()
