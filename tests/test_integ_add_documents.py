"""Ported reference integ tests: add-documents combined behaviors.

Source:
/root/reference/tests/tensor_search/integ_tests/test_add_documents_combined.py
(network-free subset): batching-strategy equivalence (identical documents
AND embeddings across per_field/per_document/per_batch), index-level
normalize_embeddings control, enable_cache stays False on the add path,
resilient per-doc media failures, id-error positioning.
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import (AddDocsParams,
                                                   BatchVectorisationMode)
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

NORMALIZED = "ad-normalized"
UNNORMALIZED = "ad-unnormalized"
STRUCTURED_UNNORM = "ad-structured-unnorm"


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(NORMALIZED))
    cfg.index_management.create_index(
        IndexSettings(model="test",
                      normalizeEmbeddings=False).to_marqo_index(
                          UNNORMALIZED))
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="test",
        normalizeEmbeddings=False,
        allFields=[FieldRequest(name="text_field_1", type=FieldType.Text,
                                features=[FieldFeature.LexicalSearch])],
        tensorFields=["text_field_1"],
    ).to_marqo_index(STRUCTURED_UNNORM))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


class TestBatchingStrategyEquivalence:
    """test_different_batching_strategy_adds_the_same_documents port."""

    def test_all_strategies_identical_documents_and_embeddings(self,
                                                               config):
        docs = [
            {"_id": "1", "text_field_1": "this is a valid doc",
             "text_field_2": "some dogs biting me"},
            {"_id": "2", "text_field_1": "this is another doc",
             "text_field_2": "cats walking on the wall"},
        ]

        def add(mode):
            res = tensor_search.add_documents(config, AddDocsParams(
                index_name=NORMALIZED, docs=docs,
                tensor_fields=["text_field_1", "text_field_2"],
                batch_vectorisation_mode=mode))
            assert res["errors"] is False, res

        def get():
            res = tensor_search.get_documents_by_ids(
                config, NORMALIZED, ["1", "2"], show_vectors=True)
            embeddings = {}
            plain = []
            for doc in res["results"]:
                plain.append({k: v for k, v in doc.items()
                              if k != "_tensor_facets"})
                for facet in doc["_tensor_facets"]:
                    for key in facet:
                        if key != "_embedding":
                            embeddings[f"{doc['_id']}_{key}"] = \
                                facet["_embedding"]
            return plain, embeddings

        results = {}
        for mode in (BatchVectorisationMode.PER_FIELD,
                     BatchVectorisationMode.PER_DOCUMENT,
                     BatchVectorisationMode.PER_BATCH):
            tensor_search.delete_documents(config, NORMALIZED, ["1", "2"])
            add(mode)
            results[mode] = get()

        base_plain, base_emb = results[BatchVectorisationMode.PER_FIELD]
        for mode in (BatchVectorisationMode.PER_DOCUMENT,
                     BatchVectorisationMode.PER_BATCH):
            plain, emb = results[mode]
            assert plain == base_plain, mode
            assert set(emb) == set(base_emb), mode
            for key in base_emb:
                assert np.allclose(emb[key], base_emb[key], atol=1e-6), \
                    (mode, key)


class TestEmbeddingNormalization:
    """test_{text,image}IndexEmbeddings{Un,}normalised ports (text; the
    image variants need hub weights)."""

    def test_normalized_index_unit_norm(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=NORMALIZED,
            docs=[{"_id": "1", "text_field_1": "This is a test text"}],
            tensor_fields=["text_field_1"]))
        assert res["errors"] is False
        doc = tensor_search.get_document_by_id(config, NORMALIZED, "1",
                                               show_vectors=True)
        norm = np.linalg.norm(doc["_tensor_facets"][0]["_embedding"])
        assert abs(norm - 1.0) < 1e-5, norm

    @pytest.mark.parametrize("index_name",
                             [UNNORMALIZED, STRUCTURED_UNNORM])
    def test_unnormalized_index_non_unit_norm(self, config, index_name):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=index_name,
            docs=[{"_id": "1", "text_field_1": "This is a test text"}],
            tensor_fields=["text_field_1"]
            if index_name == UNNORMALIZED else None))
        assert res["errors"] is False, res
        doc = tensor_search.get_document_by_id(config, index_name, "1",
                                               show_vectors=True)
        norm = np.linalg.norm(doc["_tensor_facets"][0]["_embedding"])
        assert abs(norm - 1.0) > 1e-5, norm


class TestAddDocsVectorisePath:
    def test_vectorise_called_without_enable_cache(self, config,
                                                   monkeypatch):
        """Add-docs must NOT consult the inference cache
        (test_add_document_callVectoriseWithoutPassingEnableCache)."""
        calls = []
        real = inference.vectorise

        def spy(*args, **kwargs):
            calls.append(kwargs)
            return real(*args, **kwargs)

        import marqo_tpu.core.add_documents as ad
        monkeypatch.setattr(ad.inference, "vectorise", spy)
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=NORMALIZED,
            docs=[{"_id": "1", "text_field_1": "some text"}],
            tensor_fields=["text_field_1"]))
        assert res["errors"] is False
        assert calls, "vectorise never called"
        for kwargs in calls:
            assert kwargs.get("enable_cache", False) is False

    def test_image_url_on_text_index_is_text(self, config):
        """On a text index (treatUrlsAndPointersAsImages off) an image URL
        is indexed as plain TEXT and succeeds — no download attempted."""
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=NORMALIZED,
            docs=[{"_id": "u", "field":
                   "https://invalid.example.com/missing.jpg"}],
            tensor_fields=["field"]))
        assert res["errors"] is False, res

    def test_resilient_add_with_bad_media(self, config):
        """On an IMAGE index, a doc whose media pointer fails to download
        errors alone (test_resilient_add_images)."""
        config.index_management.create_index(IndexSettings(
            model="img-test",
            modelProperties={"name": "img-test", "dimensions": 16,
                             "type": "clip", "random_init": True,
                             "image_size": 32},
            treatUrlsAndPointersAsImages=True).to_marqo_index("ad-image"))
        config.index_meta_cache.populate()
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="ad-image",
            docs=[
                {"_id": "good", "text_field_1": "plain text"},
                {"_id": "bad", "image_field_1":
                    "https://invalid.example.com/missing.jpg"},
            ], tensor_fields=["text_field_1", "image_field_1"]))
        statuses = {i["_id"]: i["status"] for i in res["items"]}
        assert statuses["good"] == 200
        assert statuses["bad"] == 400
        assert res["errors"] is True

    def test_id_error_position_preserved(self, config):
        """Invalid-id docs error in their request position
        (test_idErrorWhenImageDownloading)."""
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=NORMALIZED,
            docs=[
                {"_id": "ok1", "text_field_1": "text one"},
                {"_id": 123, "text_field_1": "bad id"},
                {"_id": "ok2", "text_field_1": "text two"},
            ], tensor_fields=["text_field_1"]))
        assert res["errors"] is True
        assert [i["status"] for i in res["items"]] == [200, 400, 200]
        assert res["items"][1]["code"] == "invalid_document_id"


class TestCombinedResiduals:
    """Round-4 additions (reference test_add_documents_combined.py:
    204-239 truncated image, 470-567 image-embedded-as-image,
    894-906 webp / extension-less URL modality)."""

    CLIP_PROPS = {"type": "clip", "dimensions": 24, "random_init": True,
                  "image_size": 32, "architecture": {"patch_size": 8}}

    @pytest.fixture
    def img_config(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="my-test-clip", modelProperties=self.CLIP_PROPS,
            treatUrlsAndPointersAsImages=True,
        ).to_marqo_index("adc-img"))
        cfg.index_meta_cache.populate()
        yield cfg
        inference.clear_loaded_models()

    def test_add_documents_with_truncated_image(self, img_config,
                                                tmp_path):
        """A truncated image fails THAT doc with a media error; the batch
        survives (reference :204-239)."""
        from PIL import Image
        good = tmp_path / "good.png"
        Image.new("RGB", (32, 32), color=(10, 200, 10)).save(good)
        truncated = tmp_path / "truncated.png"
        truncated.write_bytes(good.read_bytes()[:60])  # cut mid-stream
        res = tensor_search.add_documents(img_config, AddDocsParams(
            index_name="adc-img",
            docs=[{"_id": "good", "img": str(good)},
                  {"_id": "bad", "img": str(truncated)}],
            tensor_fields=["img"]))
        items = {i["_id"]: i for i in res["items"]}
        assert items["good"]["status"] == 200
        assert items["bad"]["status"] == 400
        assert "Could not process the media file found at" in \
            items["bad"]["error"]

    def test_image_url_is_embedded_as_image_not_text(self, img_config,
                                                     tmp_path):
        """The stored embedding for an image pointer equals the IMAGE
        embedding, not the embedding of the URL string (reference
        :470-507)."""
        from PIL import Image
        img = tmp_path / "thing.png"
        Image.new("RGB", (32, 32), color=(200, 10, 10)).save(img)
        res = tensor_search.add_documents(img_config, AddDocsParams(
            index_name="adc-img", docs=[{"_id": "1", "img": str(img)}],
            tensor_fields=["img"]))
        assert res["errors"] is False, res
        stored = np.asarray(tensor_search.get_document_by_id(
            img_config, "adc-img", "1",
            show_vectors=True)["_tensor_facets"][0]["_embedding"])
        as_image = np.asarray(inference.vectorise(
            "my-test-clip", [str(img)], model_properties=self.CLIP_PROPS,
            device="cpu", modality="image", normalize=True))[0]
        as_text = np.asarray(inference.vectorise(
            "my-test-clip", [str(img)], model_properties=self.CLIP_PROPS,
            device="cpu", normalize=True))[0]
        np.testing.assert_allclose(stored, as_image, atol=1e-5)
        assert np.abs(stored - as_text).sum() > 1e-3

    def test_webp_url_infer_modality(self):
        from marqo_tpu.inference.types import Modality
        from marqo_tpu.tensor_search.add_docs import infer_modality
        assert infer_modality(
            "https://i.example.com/g/img/s-l1600.webp") == Modality.IMAGE

    def test_no_extension_image_url_infer_modality(self):
        """Extension-less URLs are sniffed via a content sample
        (reference multimodal_model_load.py:167-183)."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from marqo_tpu.inference.types import Modality
        from marqo_tpu.tensor_search.add_docs import infer_modality

        class PngNoExt(BaseHTTPRequestHandler):
            def do_GET(self):
                body = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        server = ThreadingHTTPServer(("127.0.0.1", 0), PngNoExt)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            url = (f"http://127.0.0.1:{server.server_address[1]}"
                   f"/catalogue/image/by-rb-work/157037551/simple-preview")
            assert infer_modality(url) == Modality.IMAGE
        finally:
            server.shutdown()
