"""Video ingestion + search e2e with cv2-generated clips (no ffmpeg)."""

import os

import cv2
import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

LB_PROPS = {
    "type": "languagebind", "dimensions": 24, "random_init": True,
    "image_size": 32,
    "architecture": {"patch_size": 8, "audio_frames": 496,
                     "audio_patch": 16},
}


def _write_video(path, color, seconds=4, fps=5, size=(64, 48)):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, size)
    assert writer.isOpened()
    frame = np.zeros((size[1], size[0], 3), np.uint8)
    frame[:, :] = color[::-1]  # BGR
    for _ in range(int(seconds * fps)):
        writer.write(frame)
    writer.release()
    return str(path)


@pytest.fixture
def videos(tmp_path):
    return {
        "red": _write_video(tmp_path / "red.avi", (220, 30, 30)),
        "blue": _write_video(tmp_path / "blue.avi", (30, 30, 220)),
    }


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    settings = IndexSettings(model="my-lb-video", modelProperties=LB_PROPS,
                             treatUrlsAndPointersAsImages=True,
                             treatUrlsAndPointersAsMedia=True,
                             videoPreprocessing={"splitLength": 2,
                                                 "splitOverlap": 1})
    cfg.index_management.create_index(settings.to_marqo_index("vid-index"))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


class TestVideoIngest:
    def test_add_and_search_video(self, config, videos):
        docs = [{"_id": name, "clip": path} for name, path in videos.items()]
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="vid-index", docs=docs, tensor_fields=["clip"]))
        assert res["errors"] is False, res["items"]
        # 4s videos, 2s clips with 1s overlap → 3 chunks per video
        assert config.engine.vector_count("vid-index") == 6
        facets = tensor_search.get_document_by_id(
            config, "vid-index", "red", show_vectors=True)["_tensor_facets"]
        assert facets[0]["clip"].startswith("[0.0")
        # search by image: a red frame should retrieve the red video
        from PIL import Image
        red_img_path = os.path.join(os.path.dirname(videos["red"]),
                                    "probe.png")
        Image.new("RGB", (64, 48), (220, 30, 30)).save(red_img_path)
        out = tensor_search.search(config, "vid-index", text=red_img_path)
        assert out["hits"][0]["_id"] == "red"

    def test_corrupt_video_isolated(self, config, videos, tmp_path):
        bad = tmp_path / "bad.mp4"
        bad.write_bytes(b"not a real video at all")
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="vid-index",
            docs=[{"_id": "ok", "clip": videos["red"]},
                  {"_id": "bad", "clip": str(bad)}],
            tensor_fields=["clip"]))
        statuses = {i["_id"]: i["status"] for i in res["items"]}
        assert statuses["ok"] == 200
        assert statuses["bad"] == 400
