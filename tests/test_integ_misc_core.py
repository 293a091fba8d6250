"""Ported reference tests: small core/misc suites.

Sources:
/root/reference/tests/core/index_management/test_get_settings.py (3),
/root/reference/tests/core/models/test_marqo_index.py (3),
/root/reference/tests/s2_inference/test_image_downloading.py (5,
network-free subset with a local HTTP server),
/root/reference/tests/core/index_management/test_index_validation.py (4).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from marqo_tpu.api.models.index_settings import (FieldRequest, IndexSettings)
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.marqo_index import (Field, FieldFeature,
                                               FieldType, IndexType,
                                               MarqoIndex,
                                               StructuredMarqoIndex)


@pytest.fixture
def config():
    cfg = Config()
    cfg.index_management.bootstrap()
    yield cfg


class TestGetSettings:
    """reference test_get_settings.py"""

    def test_no_index(self, config):
        with pytest.raises(IndexNotFoundError):
            config.index_management.get_index("non-existent-index")

    def test_default_settings_unstructured(self, config):
        """The exact default-settings dict golden (:74-103)."""
        config.index_management.create_index(
            IndexSettings().to_marqo_index("gs-unstructured"))
        retrieved = config.index_management.get_index("gs-unstructured")
        settings = IndexSettings.from_marqo_index(retrieved)
        assert settings == {
            "annParameters": {
                "parameters": {"efConstruction": 512, "m": 16},
                "spaceType": "prenormalized-angular"},
            "filterStringMaxLength": 50,
            "imagePreprocessing": {},
            "model": "hf/e5-base-v2",
            "normalizeEmbeddings": True,
            "textPreprocessing": {"splitLength": 2,
                                  "splitMethod": "sentence",
                                  "splitOverlap": 0},
            "audioPreprocessing": {"splitLength": 10, "splitOverlap": 3},
            "videoPreprocessing": {"splitLength": 20, "splitOverlap": 3},
            "treatUrlsAndPointersAsImages": False,
            "treatUrlsAndPointersAsMedia": False,
            "type": "unstructured",
            "vectorNumericType": "float",
        }

    def test_default_settings_structured(self, config):
        """Structured default golden (:105-141)."""
        config.index_management.create_index(IndexSettings(
            type=IndexType.Structured,
            allFields=[FieldRequest(name="field1", type=FieldType.Text),
                       FieldRequest(name="field2", type=FieldType.Text)],
            tensorFields=[],
        ).to_marqo_index("gs-structured"))
        retrieved = config.index_management.get_index("gs-structured")
        settings = IndexSettings.from_marqo_index(retrieved)
        assert settings == {
            "allFields": [
                {"features": [], "name": "field1", "type": "text"},
                {"features": [], "name": "field2", "type": "text"},
            ],
            "annParameters": {
                "parameters": {"efConstruction": 512, "m": 16},
                "spaceType": "prenormalized-angular"},
            "imagePreprocessing": {},
            "model": "hf/e5-base-v2",
            "normalizeEmbeddings": True,
            "tensorFields": [],
            "textPreprocessing": {"splitLength": 2,
                                  "splitMethod": "sentence",
                                  "splitOverlap": 0},
            "audioPreprocessing": {"splitLength": 10, "splitOverlap": 3},
            "videoPreprocessing": {"splitLength": 20, "splitOverlap": 3},
            "type": "structured",
            "vectorNumericType": "float",
        }

    def test_custom_settings(self, config):
        """Custom creation values come back verbatim (:144-207 subset)."""
        config.index_management.create_index(IndexSettings(
            model="my-custom", modelProperties={
                "type": "clip", "dimensions": 24, "random_init": True,
                "image_size": 32, "architecture": {"patch_size": 8}},
            normalizeEmbeddings=False,
            textPreprocessing={"splitLength": 3, "splitMethod": "word",
                               "splitOverlap": 1},
            treatUrlsAndPointersAsImages=True,
        ).to_marqo_index("gs-custom"))
        retrieved = config.index_management.get_index("gs-custom")
        settings = IndexSettings.from_marqo_index(retrieved)
        assert settings["model"] == "my-custom"
        assert settings["normalizeEmbeddings"] is False
        assert settings["textPreprocessing"] == {
            "splitLength": 3, "splitMethod": "word", "splitOverlap": 1}
        assert settings["treatUrlsAndPointersAsImages"] is True
        assert settings["modelProperties"]["dimensions"] == 24


def _structured(name, fields, version):
    return StructuredMarqoIndex(
        name=name, schema_name=name, type=IndexType.Structured,
        model={"name": "test"}, fields=fields, tensor_fields=[],
        marqo_version=version)


class TestMarqoIndexModel:
    """reference core/models/test_marqo_index.py"""

    FIELDS = [
        Field(name="title", type=FieldType.Text),
        Field(name="price", type=FieldType.Float,
              features=[FieldFeature.Filter],
              filter_field_name="price_filter"),
        Field(name="tags", type=FieldType.Text,
              features=[FieldFeature.Filter],
              filter_field_name="tags_filter"),
    ]

    @pytest.mark.parametrize("version", ["2.0.0", "2.0.1", "2.1.0",
                                         "2.1.5"])
    def test_filterable_field_names_pre220(self, version):
        index = _structured("my_index", self.FIELDS, version)
        assert index.filterable_fields_names == {"price", "tags"}

    @pytest.mark.parametrize("version", ["2.2.0", "2.2.1", "2.3.0",
                                         "2.5.5"])
    def test_filterable_field_names_post220(self, version):
        index = _structured("my_index", self.FIELDS, version)
        assert index.filterable_fields_names == {"_id", "price", "tags"}

    def test_deserialization_with_extra_fields(self):
        """Extra (future-version) fields must deserialize AND survive
        re-serialization (:74-108)."""
        index = _structured("my_index",
                            [Field(name="title", type=FieldType.Text)],
                            "2.12.0")
        as_json = json.loads(index.model_dump_json())
        as_json["random_field"] = "value"
        parsed = StructuredMarqoIndex.model_validate(as_json)
        assert parsed.random_field == "value"
        assert "random_field" in parsed.model_dump_json()


class _HeaderEcho(BaseHTTPRequestHandler):
    seen = []
    payload = b"\x89PNG\r\n\x1a\nfakepng"

    def do_GET(self):
        type(self).seen.append({"path": self.path,
                                "user_agent": self.headers.get("User-Agent"),
                                "a": self.headers.get("a")})
        if self.path == "/missing_image.jpg":
            self.send_response(301)
            self.send_header("Location", "/image.jpg")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.payload)))
        self.end_headers()
        self.wfile.write(self.payload)

    def log_message(self, *args):
        pass


@pytest.fixture
def echo_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _HeaderEcho)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    _HeaderEcho.seen = []
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


class TestImageDownloading:
    """reference s2_inference/test_image_downloading.py (offline subset)"""

    ENCODE_CASES = [
        ("http://example.com", "http://example.com"),
        ("http://example.com/test url", "http://example.com/test%20url"),
        ("http://example.com/你好世界",
         "http://example.com/%E4%BD%A0%E5%A5%BD%E4%B8%96%E7%95%8C"),
        ("http://example.com/test?name=John Doe&age=30",
         "http://example.com/test?name=John%20Doe&age=30"),
        ("http://example.com/test#section 1",
         "http://example.com/test#section%201"),
        ("http://example.com//test//path", "http://example.com//test//path"),
        ("http://example.com/test%20url", "http://example.com/test%20url"),
        ("http://example.com/test url%20example",
         "http://example.com/test%20url%20example"),
        ("http://example.com/" + "a" * 2000,
         "http://example.com/" + "a" * 2000),
        ("https://example.com", "https://example.com"),
        ("ftp://example.com", "ftp://example.com"),
        ("", ""),
        ("http://example.com/œ∑ł.jpg",
         "http://example.com/%C5%93%E2%88%91%C5%82.jpg"),
        ("http://127.0.0.1/test", "http://127.0.0.1/test"),
    ]

    def test_encode_url_goldens(self):
        from marqo_tpu.tensor_search.add_docs import encode_url
        for url, expected in self.ENCODE_CASES:
            assert encode_url(url) == expected, url
            assert encode_url(encode_url(url)) == expected, url  # idempotent

    def test_default_user_agent_header(self, echo_server):
        from marqo_tpu.tensor_search.add_docs import fetch_content
        fetch_content(f"{echo_server}/image.jpg")
        assert _HeaderEcho.seen[-1]["user_agent"] == "Marqobot/1.0"

    def test_merges_custom_headers_with_default(self, echo_server):
        from marqo_tpu.tensor_search.add_docs import fetch_content
        fetch_content(f"{echo_server}/image.jpg",
                      media_download_headers={"a": "b"})
        assert _HeaderEcho.seen[-1]["user_agent"] == "Marqobot/1.0"
        assert _HeaderEcho.seen[-1]["a"] == "b"

    def test_custom_user_agent_overrides_default(self, echo_server):
        from marqo_tpu.tensor_search.add_docs import fetch_content
        fetch_content(f"{echo_server}/image.jpg", media_download_headers={
            "User-Agent": "Marqobot-Image/1.0"})
        assert _HeaderEcho.seen[-1]["user_agent"] == "Marqobot-Image/1.0"

    def test_handles_redirection(self, echo_server):
        from marqo_tpu.tensor_search.add_docs import fetch_content
        data = fetch_content(f"{echo_server}/missing_image.jpg")
        assert data == _HeaderEcho.payload

    def test_unreachable_urls_raise_download_error_not_500(self):
        from marqo_tpu.tensor_search.add_docs import (MediaDownloadError,
                                                      fetch_content)
        for url in ("http://127.0.0.1:1/nope.jpg",
                    "http://example.invalid/test url.jpg"):
            with pytest.raises(MediaDownloadError):
                fetch_content(url, timeout=1.0)


class TestIndexValidation:
    """reference core/index_management/test_index_validation.py.
    Adaptation: the reference rejects numberOfShards/numberOfReplicas as
    unknown fields (its IndexSettings doesn't model them); this build's
    cluster supports shards, so the unknown-field case uses genuinely
    unknown keys instead."""

    def _input(self, model="hf/e5-base-v2",
               treat_urls_and_pointers_as_images=False, **extra):
        return {
            "treatUrlsAndPointersAsImages": treat_urls_and_pointers_as_images,
            "model": model,
            "normalizeEmbeddings": True,
            "textPreprocessing": {"splitLength": 2, "splitOverlap": 0,
                                  "splitMethod": "sentence"},
            "imagePreprocessing": {"patchMethod": None},
            "annParameters": {"spaceType": "euclidean",
                              "parameters": {"efConstruction": 128,
                                             "m": 16}},
            "type": "unstructured",
            **extra,
        }

    def test_validate_index_settings_with_valid_text_based_input(self):
        from marqo_tpu.core.index_management.index_management import \
            IndexManagement
        assert IndexManagement.validate_index_settings(
            "test_index", self._input()) is None

    def test_validate_index_settings_with_valid_multimodal_based_input(self):
        from marqo_tpu.core.index_management.index_management import \
            IndexManagement
        assert IndexManagement.validate_index_settings(
            "test_index", self._input(
                model="open_clip/ViT-L-14/laion2b_s32b_b82k",
                treat_urls_and_pointers_as_images=True)) is None

    def test_validate_index_settings_with_invalid_index_defaults(self):
        from marqo_tpu.core.index_management.index_management import \
            IndexManagement
        with pytest.raises(Exception) as exc:
            IndexManagement.validate_index_settings("test_index", {
                "model": "hf/e5-base-v2", "normalizeEmbeddings": True,
                "bogusSettingOne": 5, "bogusSettingTwo": 1})
        assert "validation error" in str(exc.value) or \
            "Invalid field name" in str(exc.value)

    def test_validate_index_settings_with_invalid_snake_case_input(self):
        from marqo_tpu.core.index_management.index_management import \
            IndexManagement
        with pytest.raises(Exception) as exc:
            IndexManagement.validate_index_settings(
                "test_index", {"dependent_fields": "value1"})
        assert "Invalid field name 'dependent_fields'" in str(exc.value)
