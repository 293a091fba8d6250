"""Regression tests for the round-5 add-documents/vectorise review fixes.

Reference behaviors targeted:
  - Structured indexes chunk fields AND multimodal subfields by their
    DECLARED FieldType (image_pointer children hit the image tower),
    independent of the unstructured treat_urls flags the structured
    model doesn't define.
  - tensorFields on a structured index is a request-level 400 before any
    per-doc processing (structured_add_document_handler.py:48-51).
  - Semi-structured field-cap errors fire request-level BEFORE anything
    is persisted, in the pipelined path too.
  - MARQO_MAX_VECTORISE_BATCH_SIZE is validated and honored on the
    async vectorise path like the sync one.
"""

import numpy as np
import pytest
from PIL import Image

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.add_documents import AddDocumentsHandler
from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       TooManyFieldsError)
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import FieldType, IndexType
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.types import Modality
from marqo_tpu.tensor_search import tensor_search

CLIP_PROPS = {
    "type": "clip", "dimensions": 24, "random_init": True, "image_size": 32,
    "architecture": {"patch_size": 8},
}

ST_IDX = "arf-structured"
UN_IDX = "arf-unstructured"


@pytest.fixture
def config(tmp_path):
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="my-test-clip",
        modelProperties=CLIP_PROPS,
        allFields=[
            FieldRequest(name="caption", type=FieldType.Text),
            FieldRequest(name="img", type=FieldType.ImagePointer),
            FieldRequest(name="vid", type=FieldType.VideoPointer),
            FieldRequest(name="combo", type=FieldType.MultimodalCombination,
                         dependentFields={"caption": 0.5, "img": 0.5}),
        ],
        tensorFields=["img", "combo"]).to_marqo_index(ST_IDX))
    cfg.index_management.create_index(IndexSettings(
        model="my-test-clip", modelProperties=CLIP_PROPS,
        treatUrlsAndPointersAsImages=True).to_marqo_index(UN_IDX))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


@pytest.fixture
def png(tmp_path):
    path = tmp_path / "red.png"
    Image.new("RGB", (64, 48), color=(230, 20, 20)).save(path)
    return str(path)


def _handler(cfg, index_name, **params):
    index = cfg.index_meta_cache.get_index(index_name)
    return AddDocumentsHandler(
        index, cfg.engine, AddDocsParams(index_name=index_name, **params))


class TestStructuredChildRouting:
    def test_declared_image_child_routes_to_image_tower(self, config):
        handler = _handler(config, ST_IDX, docs=[{"x": 1}])
        # declared type decides — even if the content string would sniff
        # as something else, and with NO treat flags on the index
        assert handler._child_media_modality("img", "whatever.mp4") == \
            Modality.IMAGE
        assert handler._child_media_modality("vid", "x.png") == \
            Modality.VIDEO
        assert handler._child_media_modality("caption",
                                             "http://x/y.png") is None

    def test_unstructured_children_gate_on_flags(self, config, png):
        handler = _handler(config, UN_IDX, docs=[{"x": 1}],
                           tensor_fields=["combo"])
        # treat_images=True on UN_IDX: png content sniffs IMAGE
        assert handler._child_media_modality("anychild", png) == \
            Modality.IMAGE
        assert handler._child_media_modality("anychild", "plain text") is None

    def test_structured_toplevel_pointer_kind_by_declared_type(self, config):
        handler = _handler(config, ST_IDX, docs=[{"x": 1}])
        plan = handler._plan_field({"img": "http://cdn/clip.mp4"}, "img")
        # declared image_pointer stays an image even when the URL sniffs
        # as video (it will then surface an image-decode error, like the
        # reference — not silently run the video pipeline)
        assert plan["kind"] == "image"

    def test_structured_multimodal_image_child_embeds_as_image(
            self, config, png):
        """e2e: the combo's img child must go through the image tower —
        the embedding differs from treating the path as text."""
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=ST_IDX,
            docs=[{"_id": "d1", "caption": "a red square", "img": png}]))
        assert res["errors"] is False, res
        facets = tensor_search.get_document_by_id(
            config, ST_IDX, "d1", show_vectors=True)
        combo_vecs = [f for f in facets["_tensor_facets"] if "combo" in f]
        assert combo_vecs, facets
        # compare against an unstructured flag-gated index embedding the
        # same content: both must classify img as an image, so the
        # combined embeddings agree (same model, same weights)
        res2 = tensor_search.add_documents(config, AddDocsParams(
            index_name=UN_IDX,
            docs=[{"_id": "d1", "caption": "a red square", "img": png}],
            tensor_fields=["combo"],
            mappings={"combo": {"type": "multimodal_combination",
                                "weights": {"caption": 0.5, "img": 0.5}}}))
        assert res2["errors"] is False, res2
        facets2 = tensor_search.get_document_by_id(
            config, UN_IDX, "d1", show_vectors=True)
        vec_structured = next(f["_embedding"] for f in
                              facets["_tensor_facets"] if "combo" in f)
        vec_unstructured = next(f["_embedding"] for f in
                                facets2["_tensor_facets"] if "combo" in f)
        np.testing.assert_allclose(vec_structured, vec_unstructured,
                                   rtol=1e-5, atol=1e-6)


class TestStructuredTensorFieldsRequestLevel:
    def test_request_level_400_not_per_doc_items(self, config):
        with pytest.raises(
                (InvalidArgumentError, api_exceptions.InvalidArgError)):
            tensor_search.add_documents(config, AddDocsParams(
                index_name=ST_IDX,
                docs=[{"caption": "a"}, {"caption": "b"}],
                tensor_fields=["caption"]))


class TestPipelinedFieldCapIsRequestLevel:
    def test_no_docs_persisted_when_cap_exceeded(self, config, monkeypatch):
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("arf-semi"))
        cfg.index_meta_cache.populate()
        monkeypatch.setenv("MARQO_TPU_INGEST_PIPELINE_SUB_BATCH", "3")
        monkeypatch.setenv("MARQO_MAX_LEXICAL_FIELD_COUNT_UNSTRUCTURED", "2")
        # 9 docs (3 sub-batches); docs in the LAST chunk introduce new
        # lexical fields that blow the cap — the old per-chunk check fed
        # chunks 1-2 before raising
        docs = [{"_id": f"d{i}", "t": f"text {i}"} for i in range(6)]
        docs += [{"_id": f"d{6 + i}", "t": f"text {6 + i}",
                  f"extra_{i}": f"v{i}"} for i in range(3)]
        with pytest.raises(TooManyFieldsError):
            tensor_search.add_documents(cfg, AddDocsParams(
                index_name="arf-semi", docs=docs, tensor_fields=["t"]))
        stats = cfg.engine.doc_count(
            cfg.index_meta_cache.get_index("arf-semi").schema_name)
        assert stats == 0, "request-level error must precede any feed"


class TestVectoriseAsyncBatchContract:
    def test_invalid_batch_size_rejected(self, config, monkeypatch):
        from marqo_tpu.api.exceptions import EnvVarError
        monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE", "abc")
        with pytest.raises(EnvVarError):
            inference.vectorise_async("test", ["a", "b"])

    def test_small_batch_size_chunks_dispatch(self, config, monkeypatch):
        monkeypatch.setenv("MARQO_MAX_VECTORISE_BATCH_SIZE", "2")
        resolve = inference.vectorise_async(
            "test", [f"sentence {i}" for i in range(5)])
        rows = resolve()
        assert len(rows) == 5
        # bit-equal with the sync path under the same cap
        sync_rows = inference.vectorise(
            "test", [f"sentence {i}" for i in range(5)])
        np.testing.assert_allclose(rows, sync_rows, rtol=1e-6, atol=1e-7)


class TestThresholdZeroHonored:
    def test_explicit_zero_not_rewritten(self, monkeypatch):
        from marqo_tpu.inference.types import Device
        monkeypatch.setenv("MARQO_MAX_TPU_MODEL_MEMORY", "0")
        assert inference._device_threshold_gib(Device.TPU) == 0.0


class TestSchedulerShutdownStranding:
    def test_shutdown_fails_stranded_waiters_immediately(self):
        """A waiter whose batch was never drained must fail at shutdown,
        not hang its full 60s timeout (model eject during serving)."""
        import threading
        import time

        import numpy as np

        from marqo_tpu.inference.batch_scheduler import (BatchScheduler,
                                                         SchedulerShutdown)
        block = threading.Event()

        def slow_encode(batch):
            block.wait(5)
            return np.zeros((len(batch), 4), dtype=np.float32)

        sched = BatchScheduler(slow_encode, max_batch=1000, max_wait_ms=1.0)
        errors = []

        def waiter():
            try:
                sched.encode(["x"], timeout=30)
            except Exception as e:
                errors.append(e)

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.05)  # let it enqueue (loop may or may not drain it)
        start = time.perf_counter()
        sched.shutdown()
        block.set()
        t.join(timeout=8)
        assert not t.is_alive()
        assert time.perf_counter() - start < 8
        # the waiter either got a result pre-shutdown or a SchedulerShutdown
        if errors:
            assert isinstance(errors[0], SchedulerShutdown)
        # new enqueues are rejected outright
        import pytest as _pytest
        with _pytest.raises(SchedulerShutdown):
            sched.encode(["y"], timeout=1)
