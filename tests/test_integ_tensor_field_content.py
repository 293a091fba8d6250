"""Port of reference tests/core/inference/test_tensor_field_content.py.

The reference unit-tests its TensorFieldContent chunk/vectorise state
machine; marqo_tpu plans fields inside AddDocumentsHandler, so this port
asserts the same observable outcomes through the add-documents API:

- a field that is BOTH a top-level tensor field and a multimodal subfield
  keeps its own multi-chunk facets while the combination uses the
  single-chunk embedding (reference :133-150)
- multimodal combination = np.mean([w_i * v_i]) over present subfields
  (reference :352-420; the multi-subfield case lives in
  tests/test_integ_multimodal.py::test_combination_is_weighted_mean)
- audio/video subfields chunk like top-level fields and contribute the
  MEAN of their clip embeddings (reference :184-211, :284-317)

The populate-from-existing resolution matrix (:37-99) is ported in
tests/test_integ_use_existing_tensors.py.
"""

import cv2
import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "tfcontent-index"

LB_PROPS = {
    "type": "languagebind", "dimensions": 24, "random_init": True,
    "image_size": 32,
    "architecture": {"patch_size": 8, "audio_frames": 496,
                     "audio_patch": 16},
}


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    # unnormalized index: combination math is observable exactly
    cfg.index_management.create_index(
        IndexSettings(model="test", normalizeEmbeddings=False
                      ).to_marqo_index(INDEX))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


@pytest.fixture
def lb_config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    settings = IndexSettings(model="my-lb-av", modelProperties=LB_PROPS,
                             normalizeEmbeddings=False,
                             treatUrlsAndPointersAsImages=True,
                             treatUrlsAndPointersAsMedia=True,
                             videoPreprocessing={"splitLength": 2,
                                                 "splitOverlap": 1})
    cfg.index_management.create_index(settings.to_marqo_index(INDEX))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _facets(cfg, doc_id, field):
    doc = tensor_search.get_document_by_id(cfg, INDEX, doc_id,
                                           show_vectors=True)
    return [f for f in doc["_tensor_facets"] if field in f]


LONG_TEXT = ("First sentence about oceans. Second sentence about rivers. "
             "Third sentence about lakes. Fourth sentence about streams. "
             "Fifth sentence about ponds. Sixth sentence about springs. "
             "Seventh sentence about deltas. Eighth sentence about bays.")


class TestBothTensorFieldAndSubfield:
    def test_field_keeps_own_chunks_and_feeds_combo_single_chunk(
            self, config):
        """Reference :133-150: the top-level facets are the multi-chunk
        split; the combination consumes the SINGLE-chunk embedding of the
        same content."""
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "d1", "body": LONG_TEXT}],
            tensor_fields=["body", "combo"],
            mappings={"combo": {"type": "multimodal_combination",
                                "weights": {"body": 2.0}}}))
        assert res["errors"] is False, res
        body_facets = _facets(config, "d1", "body")
        assert len(body_facets) > 1  # own multi-chunk facets kept
        combo_facets = _facets(config, "d1", "combo")
        assert len(combo_facets) == 1
        single = np.asarray(inference.vectorise(
            "test", [LONG_TEXT], device="cpu",
            normalize_embeddings=False)[0])
        # mean over 1 subfield: (2.0 * v) / 1
        np.testing.assert_allclose(combo_facets[0]["_embedding"],
                                   2.0 * single, atol=1e-4)
        # and the single-chunk combo vector differs from every multi-chunk
        # facet of the field itself
        for f in body_facets:
            assert not np.allclose(f["_embedding"], single, atol=1e-4)

    def test_single_subfield_weighted_mean_unnormalized(self, config):
        """Reference :352-379 normalize=False leg: combo = w * v / 1."""
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "d2", "cap": "hello world"}],
            tensor_fields=["combo"],
            mappings={"combo": {"type": "multimodal_combination",
                                "weights": {"cap": -0.48}}}))
        assert res["errors"] is False, res
        combo = _facets(config, "d2", "combo")[0]["_embedding"]
        v = np.asarray(inference.vectorise(
            "test", ["hello world"], device="cpu",
            normalize_embeddings=False)[0])
        np.testing.assert_allclose(combo, -0.48 * v, atol=1e-4)


def _write_video(path, color, seconds=4, fps=5, size=(64, 48)):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, size)
    assert writer.isOpened()
    frame = np.zeros((size[1], size[0], 3), np.uint8)
    frame[:, :] = color[::-1]
    for _ in range(int(seconds * fps)):
        writer.write(frame)
    writer.release()
    return str(path)


class TestAudioVideoSubfields:
    pytestmark = pytest.mark.slow

    def test_video_subfield_embedding_is_clip_mean(self, lb_config,
                                                   tmp_path):
        """Reference :284-317: a video subfield is chunked into clips and
        its contribution to the combination is the MEAN of the clip
        embeddings (weighted, over present subfields)."""
        video = _write_video(tmp_path / "red.avi", (220, 30, 30))
        res = tensor_search.add_documents(lb_config, AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "v-top", "clip_field": video},
                  {"_id": "v-combo", "vid": video}],
            tensor_fields=["clip_field", "combo"],
            mappings={"combo": {"type": "multimodal_combination",
                                "weights": {"vid": 1.5}}}))
        assert res["errors"] is False, res
        top_facets = _facets(lb_config, "v-top", "clip_field")
        assert len(top_facets) > 1  # multiple clips
        clip_mean = np.mean([f["_embedding"] for f in top_facets], axis=0)
        combo = _facets(lb_config, "v-combo", "combo")[0]["_embedding"]
        np.testing.assert_allclose(combo, 1.5 * clip_mean, atol=1e-3)

    def test_video_subfield_with_text_subfield(self, lb_config, tmp_path):
        """Mixed text+video combination: mean over the two weighted
        subfield embeddings (reference :381-420 generalized to media)."""
        video = _write_video(tmp_path / "blue.avi", (30, 30, 220))
        res = tensor_search.add_documents(lb_config, AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "m1", "vid": video, "cap": "a blue screen"},
                  {"_id": "v-top", "clip_field": video}],
            tensor_fields=["combo", "clip_field"],
            mappings={"combo": {"type": "multimodal_combination",
                                "weights": {"vid": 1.0, "cap": 2.0}}}))
        assert res["errors"] is False, res
        top_facets = _facets(lb_config, "v-top", "clip_field")
        clip_mean = np.mean([f["_embedding"] for f in top_facets], axis=0)
        text_vec = np.asarray(inference.vectorise(
            "my-lb-av", ["a blue screen"], model_properties=LB_PROPS,
            device="cpu", normalize_embeddings=False)[0])
        combo = _facets(lb_config, "m1", "combo")[0]["_embedding"]
        expected = (1.0 * clip_mean + 2.0 * text_vec) / 2
        np.testing.assert_allclose(combo, expected, atol=1e-3)
