"""Cross-encoder reranker tests (random-init model, full JAX graph)."""

import numpy as np
import pytest

from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.inference.rerank import (clear_rerankers,
                                        rerank_search_results)
from marqo_tpu.inference.types import Device
from marqo_tpu.models.cross_encoder import JaxCrossEncoder

PROPS = {"random_init": True}


@pytest.fixture(autouse=True)
def clean():
    clear_rerankers()
    yield
    clear_rerankers()


class TestCrossEncoder:
    def test_scores_shape_and_determinism(self):
        model = JaxCrossEncoder("test-reranker", Device.CPU, PROPS)
        model.load()
        scores = model.score("red apple", ["a red apple", "a green pear",
                                           "a blue car"])
        assert scores.shape == (3,)
        again = model.score("red apple", ["a red apple"])
        assert abs(scores[0] - again[0]) < 1e-2

    def test_pair_encoding_has_type_ids(self):
        model = JaxCrossEncoder("test-reranker", Device.CPU, PROPS)
        model.load()
        pairs = model.tokenizer.encode_pairs(["query text"], ["doc text"])
        assert pairs["token_type_ids"].max() == 1
        assert pairs["attention_mask"].sum() > 4


class TestRerankIntegration:
    def test_rerank_overwrites_scores_and_sorts(self):
        result = {"hits": [
            {"_id": "a", "title": "red apple pie", "_score": 0.1},
            {"_id": "b", "title": "green pear tart", "_score": 0.9},
        ]}
        rerank_search_results(result, "red apple", "test-reranker",
                              device="cpu", searchable_attributes=["title"],
                              properties=PROPS)
        scores = [h["_score"] for h in result["hits"]]
        assert scores == sorted(scores, reverse=True)
        # scores are cross-encoder logits now, not the original 0.1/0.9
        assert set(scores) != {0.1, 0.9}

    def test_none_searchable_attributes_uses_all_fields(self):
        # module-level None = concat all non-underscore fields (reference
        # rerank.py ReRankerText; the API layer rejects None separately)
        result = {"hits": [
            {"_id": "a", "title": "red apple pie", "_score": 0.1},
            {"_id": "b", "title": "green pear tart", "_score": 0.9},
        ]}
        rerank_search_results(result, "red apple", "test-reranker",
                              device="cpu", searchable_attributes=None,
                              properties=PROPS)
        scores = [h["_score"] for h in result["hits"]]
        assert scores == sorted(scores, reverse=True)
        assert set(scores) != {0.1, 0.9}

    def test_search_layer_rejects_none_searchable_attributes(self):
        # reference tensor_search.py:1446-1447 exact wording
        from marqo_tpu.api import exceptions as api_exceptions
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.inference import vectorise as inference
        from marqo_tpu.tensor_search import tensor_search
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("rr-none-index"))
        cfg.index_meta_cache.populate()
        with pytest.raises(api_exceptions.InvalidArgError,
                           match="cannot be None when re-ranking"):
            tensor_search.search(cfg, "rr-none-index", text="q",
                                 reranker="test-reranker",
                                 reranker_properties=PROPS)
        inference.clear_loaded_models()

    def test_skips_when_no_hit_has_the_field(self):
        # reference rerank.py:27-31 — silently skip, scores untouched
        result = {"hits": [{"_id": "a", "other": "x", "_score": 0.7}]}
        rerank_search_results(result, "q", "test-reranker", device="cpu",
                              searchable_attributes=["title"],
                              properties=PROPS)
        assert result["hits"][0]["_score"] == 0.7

    def test_search_with_reranker_e2e(self):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.inference import vectorise as inference
        from marqo_tpu.tensor_search import tensor_search
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test").to_marqo_index("rr-index"))
        cfg.index_meta_cache.populate()
        tensor_search.add_documents(cfg, AddDocsParams(
            index_name="rr-index",
            docs=[{"_id": "1", "title": "red apple"},
                  {"_id": "2", "title": "green pear"}],
            tensor_fields=["title"]))
        res = tensor_search.search(
            cfg, "rr-index", text="apple", searchable_attributes=["title"],
            reranker="test-reranker", reranker_properties=PROPS)
        assert len(res["hits"]) == 2
        inference.clear_loaded_models()


class TestOwlImageReranker:
    """OWL-ViT image reranking (reference rerank.py:32-44 +
    cross_encoders.py:341-461) with a tiny random-init detector."""

    OWL_PROPS = {"random_init": True,
                 "architecture": {"vocab_size": 128, "hidden_size": 32,
                                  "layers": 2, "heads": 2, "image_size": 32,
                                  "patch_size": 8}}

    def _image(self, tmp_path, name, seed):
        from PIL import Image
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        path = str(tmp_path / name)
        Image.fromarray(arr).save(path)
        return path

    def test_rerank_scores_and_box_highlights(self, tmp_path):
        img_a = self._image(tmp_path, "a.png", 1)
        img_b = self._image(tmp_path, "b.png", 2)
        result = {"hits": [
            {"_id": "a", "img": img_a, "_score": 0.1},
            {"_id": "b", "img": img_b, "_score": 0.9},
            {"_id": "c", "title": "no image field", "_score": 0.5},
        ]}
        rerank_search_results(result, "a red ball", "owl/ViT-B/32",
                              device="cpu", searchable_attributes=["img"],
                              properties=self.OWL_PROPS)
        hits = {h["_id"]: h for h in result["hits"]}
        # image hits got detector scores + box highlights in orig pixels
        for hid, path in (("a", img_a), ("b", img_b)):
            hit = hits[hid]
            assert 0.0 <= hit["_score"] <= 1.0
            box = hit["_highlights"][0]["img"]
            assert len(box) == 4
            x1, y1, x2, y2 = box
            assert 0 <= x1 <= x2 <= 64 and 0 <= y1 <= y2 <= 48
        # hits WITHOUT the image field are REMOVED (reference
        # test_reranking_images_owl_inconsistent: N_out == N_in)
        assert "c" not in hits
        assert len(result["hits"]) == 2
        scores = [h["_score"] for h in result["hits"]]
        assert scores == sorted(scores, reverse=True)

    def test_requires_searchable_attributes(self):
        # reference rerank.py:34-36 — RerankerError with exact wording
        from marqo_tpu.core.exceptions import RerankerError
        with pytest.raises(RerankerError,
                           match="found searchable_attributes"):
            rerank_search_results({"hits": [{"_id": "x", "f": 1}]}, "q",
                                  "owl/ViT-B/32", device="cpu",
                                  searchable_attributes=None,
                                  properties=self.OWL_PROPS)

    def test_unknown_owl_model_name(self):
        # reference cross_encoders.py:364 via RerankerNameError
        from marqo_tpu.core.exceptions import RerankerError
        with pytest.raises(RerankerError,
                           match="could not find model_name="):
            rerank_search_results(
                {"hits": [{"_id": "x", "img": "a.png"}]}, "q",
                "google/owlvt-base-patch32", device="cpu",
                searchable_attributes=["img"], properties=self.OWL_PROPS)

    def test_unreadable_image_scores_zero(self, tmp_path):
        img = self._image(tmp_path, "ok.png", 3)
        result = {"hits": [
            {"_id": "good", "img": img, "_score": 0.2},
            {"_id": "bad", "img": str(tmp_path / "missing.png"),
             "_score": 0.9},
        ]}
        rerank_search_results(result, "thing", "owl/ViT-B/32",
                              device="cpu", searchable_attributes=["img"],
                              properties=self.OWL_PROPS)
        hits = {h["_id"]: h for h in result["hits"]}
        assert hits["bad"]["_score"] == 0.0
        assert result["hits"][0]["_id"] == "good"

    def test_unknown_owl_name_rejected(self):
        from marqo_tpu.inference.rerank import JaxOwlReranker
        with pytest.raises(InvalidArgumentError, match="mappings"):
            JaxOwlReranker("howl/not-a-model", Device.CPU,
                           {"random_init": True}).load()

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
