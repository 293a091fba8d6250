"""Ported reference integ tests: dict (map) score modifiers.

Source:
/root/reference/tests/tensor_search/integ_tests/test_dict_score_modifiers.py
— map<text, number> fields as score modifiers (`map_field.key` paths),
double/long precision, partial updates, per-doc map validation errors.
"""

import pytest

from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

STRUCTURED = "dsm-structured"
UNSTRUCTURED = "dsm-unstructured"


def _structured_settings():
    f = FieldRequest
    sm = [FieldFeature.ScoreModifier]
    return IndexSettings(
        type=IndexType.Structured, model="random",
        allFields=[
            f(name="text_field", type=FieldType.Text,
              features=[FieldFeature.LexicalSearch]),
            f(name="double_score_mods", type=FieldType.Double, features=sm),
            f(name="float_score_mods", type=FieldType.Float, features=sm),
            f(name="map_score_mods", type=FieldType.MapFloat, features=sm),
            f(name="map_score_mods_int", type=FieldType.MapInt, features=sm),
            f(name="map_score_mods_long", type=FieldType.MapLong,
              features=sm),
            f(name="map_score_mods_double", type=FieldType.MapDouble,
              features=sm),
            f(name="score_mods_int", type=FieldType.Int, features=sm),
            f(name="score_mods_long", type=FieldType.Long, features=sm),
            f(name="price_2", type=FieldType.Float, features=sm),
        ],
        tensorFields=["text_field"],
    )


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        _structured_settings().to_marqo_index(STRUCTURED))
    cfg.index_management.create_index(
        IndexSettings(model="random").to_marqo_index(UNSTRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _add(cfg, index_name, docs):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=index_name, docs=docs,
        tensor_fields=["text_field"]
        if index_name == UNSTRUCTURED else None))


MAP_DOCS = [
    {"_id": "1", "text_field": "a photo of a cat",
     "map_score_mods": {"a": 0.5}},
    {"_id": "2", "text_field": "a photo of a dog",
     "map_score_mods": {"b": 0.5}},
    {"_id": "3", "text_field": "a photo of a cat",
     "map_score_mods": {"c": 0.5}},
    {"_id": "4", "text_field": "a photo of a cat",
     "map_score_mods_int": {"a": 1}},
    {"_id": "5", "text_field": "a photo of a cat",
     "map_score_mods_int": {"b": 1}},
    {"_id": "6", "text_field": "a photo of a cat",
     "map_score_mods_int": {"c": 1}},
    {"_id": "7", "text_field": "a photo of a cat",
     "map_score_mods_int": {"c": 1}, "map_score_mods": {"a": 0.5}},
]


class TestDictScoreModifiers:
    def test_double_score_modifier(self, config):
        res = _add(config, STRUCTURED, [
            {"_id": "1", "text_field": "a photo of a cat",
             "double_score_mods": 0.5},
            {"_id": "2", "text_field": "a photo of a cat",
             "double_score_mods": 4.5},
            {"_id": "3", "text_field": "a photo of a cat",
             "double_score_mods": 5.5},
            {"_id": "4", "text_field": "a photo of a cat"},
        ])
        assert res["errors"] is False, res
        res = tensor_search.search(
            config, STRUCTURED, text="", limit=10,
            score_modifiers={"add_to_score": [
                {"field_name": "double_score_mods", "weight": 2}]})
        assert res["hits"][0]["_id"] == "3"
        assert 11 <= res["hits"][0]["_score"] <= 12

    def test_long_score_modifier(self, config):
        res = _add(config, STRUCTURED, [
            {"_id": "1", "text_field": "a photo of a cat",
             "score_mods_long": 4294967295012},
            {"_id": "2", "text_field": "a photo of a cat",
             "score_mods_long": 1},
        ])
        assert res["errors"] is False, res
        res = tensor_search.search(
            config, STRUCTURED, text="", limit=10,
            score_modifiers={"add_to_score": [
                {"field_name": "score_mods_long", "weight": 20}]})
        assert res["hits"][0]["_id"] == "1"
        assert 85899345900239 <= res["hits"][0]["_score"] <= 85899345900241

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_add_to_score_map_score_modifier(self, config, index_name):
        res = _add(config, index_name, MAP_DOCS)
        assert res["errors"] is False, res
        res = tensor_search.search(
            config, index_name, text="", limit=10,
            score_modifiers={"add_to_score": [
                {"field_name": "map_score_mods_int.c", "weight": 5}]})
        assert res["hits"][0]["_id"] in ("6", "7")
        assert 5 <= res["hits"][0]["_score"] <= 6

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_multiply_score_by_map_score_modifier(self, config, index_name):
        res = _add(config, index_name, MAP_DOCS)
        assert res["errors"] is False, res
        # nonexistent field must not zero out the whole score
        res = tensor_search.search(
            config, index_name, text="", limit=10,
            score_modifiers={"multiply_score_by": [
                {"field_name": "map_score_mods.a", "weight": 4},
                {"field_name": "map_score_mods.d", "weight": 4}]})
        assert res["hits"][0]["_id"] in ("1", "7")
        assert 0.8 <= res["hits"][0]["_score"] <= 1.2

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_combined_map_score_modifier(self, config, index_name):
        res = _add(config, index_name, MAP_DOCS)
        assert res["errors"] is False, res
        res = tensor_search.search(
            config, index_name, text="", limit=10,
            score_modifiers={
                "add_to_score": [
                    {"field_name": "map_score_mods_int.c", "weight": 2}],
                "multiply_score_by": [
                    {"field_name": "map_score_mods.a", "weight": 4}]})
        assert res["hits"][0]["_id"] == "7"
        assert 2.9 <= res["hits"][0]["_score"] <= 3.1

    @pytest.mark.parametrize("index_name", [STRUCTURED, UNSTRUCTURED])
    def test_long_dict_score_modifier(self, config, index_name):
        res = _add(config, index_name, [
            {"_id": "1", "text_field": "a photo of a cat",
             "map_score_mods_long": {"a": 4294967295012}},
            {"_id": "2", "text_field": "a photo of a cat",
             "score_mods_long": 4294967295012},
            {"_id": "4", "text_field": "a photo of a cat",
             "score_mods_long": 1},
            {"_id": "6", "text_field": "a photo of a cat",
             "map_score_mods_int": {"c": 1}, "map_score_mods": {"a": 0.5}},
        ])
        assert res["errors"] is False, res
        res = tensor_search.search(
            config, index_name, text="", limit=10,
            score_modifiers={"add_to_score": [
                {"field_name": "map_score_mods_long.a", "weight": 20},
                {"field_name": "score_mods_long", "weight": 20}]})
        assert res["hits"][0]["_id"] in ("1", "2")
        assert res["hits"][1]["_id"] in ("1", "2")
        for hit in res["hits"][:2]:
            assert 85899345900239 <= hit["_score"] <= 85899345900241

    def test_partial_document_update(self, config):
        res = _add(config, STRUCTURED, MAP_DOCS)
        assert res["errors"] is False, res
        original = tensor_search.get_document_by_id(config, STRUCTURED, "1")
        assert original["map_score_mods"]["a"] == 0.5
        r = config.document.partial_update_documents_by_index_name(
            STRUCTURED, [{"_id": "1", "map_score_mods": {"a": 1.5}}])
        updated = tensor_search.get_document_by_id(config, STRUCTURED, "1")
        assert updated["map_score_mods"]["a"] == 1.5
        res = tensor_search.search(
            config, STRUCTURED, text="", limit=10,
            score_modifiers={"add_to_score": [
                {"field_name": "map_score_mods.a", "weight": 2}]})
        assert res["hits"][0]["_id"] == "1"
        assert 3 <= res["hits"][0]["_score"] <= 4


class TestUnstructuredMapValidation:
    def test_unsupported_map_only_fails_the_document(self, config):
        res = _add(config, UNSTRUCTURED, [
            {"_id": "1", "text_field": "a photo of a cat",
             "map_score_mods_long": {"a": 4294967295012}},
            {"_id": "2", "text_field": "a photo of a cat",
             "score_mods_long": 4294967295012},
            {"_id": "3", "text_field": "a photo of a cat",
             "score_mods_long": 1,
             "unsupported_map": {"text": "hello", "number": 42}},
            {"_id": "4", "text_field": "a photo of a cat",
             "score_mods_long": 1, "supported_number_map": {"number": 42}},
            {"_id": "5", "text_field": "a photo of a cat",
             "map_score_mods_int": {"c": 1},
             "map_score_mods_float": {"a": 0.5}},
        ])
        statuses = {item["_id"]: item["status"] for item in res["items"]}
        assert statuses == {"1": 200, "2": 200, "3": 400, "4": 200,
                            "5": 200}
        doc3 = [i for i in res["items"] if i["_id"] == "3"][0]
        assert doc3["code"] == "invalid_argument"
        assert "Value 'hello' for key 'text' in map field is not of type " \
               "int or float." in doc3["error"]

    def test_wrong_map_numerical_format(self, config):
        dims = config.index_meta_cache.get_index(
            UNSTRUCTURED).model.get_dimension()
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=UNSTRUCTURED,
            docs=[
                {"_id": "1", "text_field": "a photo of a cat",
                 "map_score_mods_long": {"a": [42]}},
                {"_id": "2", "text_field": "a photo of a cat",
                 "score_mods_long": {1: 1}},
                {"_id": "3", "text_field": "a photo of a cat",
                 "score_mods_long": 84},
                {"_id": "4", "text_field": "a photo of a cat",
                 "score_mods_long": 1,
                 "unsupported_map": {"text": "hello", "number": 42}},
                {"_id": "5", "text_field": "a photo of a cat",
                 "map_score_mods_int": {"c": 1},
                 "map_score_mods_float": {"a": 0.5}},
                {"_id": "6", "text_field": "a photo of a dog", "my_int": 2,
                 "my_custom_audio_vector_1": {
                     "vector": [float(x) for x in range(dims)]}},
            ],
            tensor_fields=["text_field", "my_combination_field",
                           "my_custom_audio_vector_1"],
            mappings={
                "my_combination_field": {
                    "type": "multimodal_combination",
                    "weights": {"text2": 0.5, "text_field": 0.5}},
                "my_custom_audio_vector_1": {"type": "custom_vector"},
            }))
        expected = {
            "1": (400, "in map field is not of type int or float"),
            "2": (400, "All keys must be strings."),
            "3": (200, None),
            "4": (400, "in map field is not of type int or float"),
            "5": (200, None),
            "6": (200, None),
        }
        for item in res["items"]:
            status, error = expected[item["_id"]]
            assert item["status"] == status, item
            if error:
                assert error in item["error"], item

    def test_map_numerical_as_custom_vector_invalid(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=UNSTRUCTURED,
            docs=[{"_id": "7", "text2": "hello", "my_int": 2,
                   "my_custom_audio_vector_1": {"vector": 24}}],
            tensor_fields=["text_field", "my_custom_audio_vector_1"],
            mappings={"my_custom_audio_vector_1": {"type": "custom_vector"}}))
        assert res["errors"] is True
        assert res["items"][0]["status"] == 400
