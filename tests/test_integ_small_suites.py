"""Ported reference tests: small s2_inference / web-validation suites.

Sources:
/root/reference/tests/s2_inference/test_encoding_random.py (2),
/root/reference/tests/s2_inference/test_encoding_test_model.py (2),
/root/reference/tests/tensor_search/test_api_validation.py (2).
"""

import numpy as np
import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.inference.model_registry import \
    get_model_properties_from_registry


@pytest.fixture(autouse=True)
def _clear_models():
    inference.clear_loaded_models()
    yield
    inference.clear_loaded_models()


TEXTS = ["hello", "big", "asasasasaaaaaaaaaaaa", "",
         "a word. another one!?. #$#."]


class TestRandomOutputs:
    """reference test_encoding_random.py — hash-based vectors are
    deterministic, list/str symmetric, and dimension-correct."""

    @pytest.mark.parametrize("name", ["random", "random/small",
                                      "random/medium", "random/large"])
    def test_load_random_text_model(self, name):
        props = get_model_properties_from_registry(name)
        for text in TEXTS:
            single = np.asarray(inference.vectorise(
                name, text, model_properties=props, device="cpu"))
            as_list = np.asarray(inference.vectorise(
                name, [text], model_properties=props, device="cpu"))
            again = np.asarray(inference.vectorise(
                name, text, model_properties=props, device="cpu"))
            assert abs(single - as_list).sum() < 1e-9
            assert abs(single - again).sum() < 1e-9
            assert single.shape[-1] == props["dimensions"]

    def test_check_output(self):
        props = get_model_properties_from_registry("random")
        for text in ["a", ["a"], ["a", "b", "longer text. with more stuff"]]:
            out = inference.vectorise("random", text, model_properties=props,
                                      device="cpu")
            # reference _check_output_type: list of lists of floats
            assert isinstance(out, list)
            assert all(isinstance(row, list) for row in out)
            assert all(isinstance(v, float) for row in out for v in row)


class TestEncodingTestModel:
    """reference test_encoding_test_model.py — the tiny real JAX
    encoder behaves like a model: deterministic, list/str symmetric."""

    def test_load_test_text_model(self):
        props = get_model_properties_from_registry("test")
        for text in TEXTS:
            single = np.asarray(inference.vectorise(
                "test", text, model_properties=props, device="cpu"))
            as_list = np.asarray(inference.vectorise(
                "test", [text], model_properties=props, device="cpu"))
            again = np.asarray(inference.vectorise(
                "test", text, model_properties=props, device="cpu"))
            assert abs(single - as_list).sum() < 1e-6
            assert abs(single - again).sum() < 1e-6
            assert single.shape[-1] == props["dimensions"]

    def test_check_output(self):
        props = get_model_properties_from_registry("test")
        for text in ["a", ["a"], ["a", "b", "longer text. with more stuff"]]:
            out = inference.vectorise("test", text, model_properties=props,
                                      device="cpu")
            assert isinstance(out, list)
            assert all(isinstance(row, list) for row in out)
            assert all(isinstance(v, float) for row in out for v in row)


class TestApiValidation:
    """reference tensor_search/test_api_validation.py — the API device
    string validator accepts prefix+digits forms unchanged and rejects
    non-strings and colon forms."""

    def test_validate_api_device_string_good(self):
        from marqo_tpu.api.api_utils import validate_api_device_string
        for good in ["cpu", "cuda", "CPU", "CUDA2", "cuda1234", "cpu1",
                     "tpu", None]:
            assert validate_api_device_string(good) == good

    def test_validate_api_device_string_bad(self):
        from marqo_tpu.api.api_utils import validate_api_device_string
        for bad in [dict(), set(), 123, "CUDA:1", "JKJKNN", "cpu:3",
                    "cuda:3"]:
            with pytest.raises(api_exceptions.InvalidArgError):
                validate_api_device_string(bad)


class TestImagePreprocessingFormats:
    """reference tensor_search/test_image_preprocessing.py — on a
    patch-method index, search highlights and document facets carry the
    bbox STRING "[l, t, r, b]" for image chunks."""

    CLIP_PROPS = {"type": "clip", "dimensions": 24, "random_init": True,
                  "image_size": 32, "architecture": {"patch_size": 8}}

    @pytest.fixture
    def setup(self, tmp_path):
        from PIL import Image

        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        img = tmp_path / "img.png"
        Image.new("RGB", (64, 48), color=(200, 50, 50)).save(img)
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="my-test-clip", modelProperties=self.CLIP_PROPS,
            treatUrlsAndPointersAsImages=True,
            imagePreprocessing={"patchMethod": "simple"},
        ).to_marqo_index("imgprep-index"))
        cfg.index_meta_cache.populate()
        from marqo_tpu.core.models.add_docs_params import AddDocsParams
        from marqo_tpu.tensor_search import tensor_search
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="imgprep-index",
            docs=[{"image_field_1": str(img), "_id": "1"}],
            tensor_fields=["image_field_1"]))
        assert res["errors"] is False, res
        return cfg

    def test_image_preprocess_search_highlights_format(self, setup):
        import ast

        from marqo_tpu.tensor_search import tensor_search
        res = tensor_search.search(setup, "imgprep-index", text="test")
        hit = res["hits"][0]
        assert "_highlights" in hit
        assert "image_field_1" in hit["_highlights"][0]
        value = hit["_highlights"][0]["image_field_1"]
        assert isinstance(value, str)
        parsed = ast.literal_eval(value)
        assert isinstance(parsed, list) and len(parsed) == 4

    def test_image_preprocess_get_documents_format(self, setup):
        import ast

        from marqo_tpu.tensor_search import tensor_search
        doc = tensor_search.get_document_by_id(setup, "imgprep-index", "1",
                                               show_vectors=True)
        # 3x3 grid + whole image = 10 facets, each chunk a bbox string
        assert len(doc["_tensor_facets"]) == 10
        for facet in doc["_tensor_facets"]:
            parsed = ast.literal_eval(facet["image_field_1"])
            assert isinstance(parsed, list) and len(parsed) == 4
