"""Ported reference tests: HuggingFace model_properties validation.

Source: /root/reference/tests/core/inference/
test_hugging_face_model_properties.py — mandatory/optional fields,
camelCase aliases, type restricted to hf/hf_stella, url XOR
model_location, at-least-one-source, pooling enum validation and
name-based inference (defaults to mean offline), and loader wiring
(invalid custom properties fail model load with a 400-class error).
"""

from unittest import mock

import pydantic
import pytest

from marqo_tpu.inference.hf_model_properties import (
    HfModelLocation, HuggingFaceModelProperties, ModelLocation,
    PoolingMethod)

LOCATION = {"hf": {"repoId": "test-repo-id", "filename": "test-filename"}}


class TestHuggingFaceModelProperties:
    def test_valid_model_with_mandatory_fields(self):
        model = HuggingFaceModelProperties(name="test-model", type="hf",
                                           dimensions=768)
        assert model.name == "test-model"
        assert model.tokens == 128
        assert model.type == "hf"
        assert model.pooling_method == PoolingMethod.Mean
        assert model.dimensions == 768
        assert model.url is None
        assert model.model_location is None
        assert model.note is None

    def test_valid_model_with_custom_fields(self):
        model = HuggingFaceModelProperties(
            name="test-model", type="hf", dimensions=768, tokens=256,
            pooling_method=PoolingMethod.CLS)
        assert model.tokens == 256
        assert model.pooling_method == PoolingMethod.CLS

    @pytest.mark.parametrize("payload", [
        {"name": "test-model", "type": "hf", "dimensions": 768,
         "tokens": 256, "poolingMethod": "cls",
         "modelLocation": LOCATION},
        {"name": "test-model", "type": "hf", "dimensions": 768,
         "tokens": 256, "pooling_method": "cls",
         "model_location": {"hf": {"repo_id": "test-repo-id",
                                   "filename": "test-filename"}}},
    ])
    def test_both_original_and_alias_fields_work(self, payload):
        model = HuggingFaceModelProperties(**payload)
        assert model.pooling_method == PoolingMethod.CLS
        assert model.model_location.hf.repo_id == "test-repo-id"
        assert model.model_location.hf.filename == "test-filename"

    def test_invalid_type(self):
        with pytest.raises(pydantic.ValidationError) as e:
            HuggingFaceModelProperties(name="test-model",
                                       type="invalid_type", dimensions=768)
        assert "The type of the model should be 'hf'" in str(e.value)

    def test_hf_stella_type_accepted(self):
        model = HuggingFaceModelProperties(name="m", type="hf_stella",
                                           dimensions=1024,
                                           pooling_method="mean")
        assert model.type == "hf_stella"

    def test_valid_model_with_url(self):
        model = HuggingFaceModelProperties(
            name="test-model", type="hf", url="http://example.com",
            dimensions=768, pooling_method="mean")
        assert model.url == "http://example.com"
        assert model.model_location is None

    def test_valid_model_with_model_location(self):
        loc = ModelLocation(hf=HfModelLocation(repo_id="test-repo-id",
                                               filename="test-filename"))
        model = HuggingFaceModelProperties(
            name="test-model", type="hf", model_location=loc,
            dimensions=768, pooling_method="mean")
        assert model.model_location == loc
        assert model.url is None

    def test_invalid_model_with_url_and_model_location(self):
        with pytest.raises(pydantic.ValidationError) as e:
            HuggingFaceModelProperties(
                name="test-model", type="hf", url="http://example.com",
                model_location=ModelLocation(
                    hf=HfModelLocation(repo_id="r", filename="f")),
                dimensions=768, pooling_method="mean")
        assert "Only one of 'url' and 'model_location' should be " \
               "provided." in str(e.value)

    def test_infer_pooling_method_called_when_missing(self):
        for method in (PoolingMethod.Mean, PoolingMethod.CLS):
            with mock.patch.object(
                    HuggingFaceModelProperties,
                    "_infer_pooling_method_from_name",
                    return_value=method) as m:
                model = HuggingFaceModelProperties(
                    name="model-with-cls", type="hf", dimensions=768)
            m.assert_called_once()
            assert model.pooling_method == method

    def test_explicit_pooling_skips_inference(self):
        with mock.patch.object(
                HuggingFaceModelProperties,
                "_infer_pooling_method_from_name") as m:
            model = HuggingFaceModelProperties(
                name="test-model", type="hf",
                pooling_method=PoolingMethod.CLS, dimensions=768)
        m.assert_not_called()
        assert model.pooling_method == PoolingMethod.CLS

    def test_explicit_invalid_pooling_method(self):
        with pytest.raises(pydantic.ValidationError):
            HuggingFaceModelProperties(name="test-model", type="hf",
                                       pooling_method="invalid",
                                       dimensions=768)

    def test_invalid_model_without_minimum_fields(self):
        with pytest.raises(pydantic.ValidationError) as e:
            HuggingFaceModelProperties(type="hf", dimensions=768,
                                       pooling_method="mean")
        assert "At least one of 'name', 'url', or 'model_location' " \
               "should be provided." in str(e.value)

    def test_url_only_infers_mean(self):
        model = HuggingFaceModelProperties(url="http://example.com",
                                           type="hf", dimensions=768)
        assert model.pooling_method == PoolingMethod.Mean

    def test_offline_inference_defaults_to_mean(self):
        assert HuggingFaceModelProperties._infer_pooling_method_from_name(
            "never-cached/nonexistent-model") == PoolingMethod.Mean


class TestLoaderWiring:
    def test_invalid_properties_fail_vectorise_with_400(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from marqo_tpu.exceptions import InvalidArgumentError
        from marqo_tpu.inference import vectorise as inference
        inference.clear_loaded_models()
        with pytest.raises(InvalidArgumentError) as e:
            inference.vectorise(
                "my-custom", ["text"], device="cpu",
                model_properties={"type": "hf", "dimensions": 768,
                                  "url": "http://example.com",
                                  "modelLocation": LOCATION,
                                  "random_init": True})
        assert "Only one of 'url' and 'model_location'" in str(e.value)
        inference.clear_loaded_models()

    def test_inferred_pooling_lands_in_loader(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from marqo_tpu.inference import vectorise as inference
        inference.clear_loaded_models()
        with mock.patch.object(
                HuggingFaceModelProperties,
                "_infer_pooling_method_from_name",
                return_value=PoolingMethod.CLS):
            inference.vectorise(
                "my-custom-cls", ["text"], device="cpu",
                model_properties={"type": "hf", "dimensions": 768,
                                  "name": "whatever",
                                  "random_init": True,
                                  "architecture": {"num_layers": 2}})
        entry = list(inference._available_models.values())[-1]
        assert entry["model"].config.pooling == "cls"
        inference.clear_loaded_models()
