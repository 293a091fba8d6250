"""Ported reference integ tests: partial document updates (structured).

Source: /root/reference/tests/core/document/test_partial_document_update.py
— field-type update matrix, filter/lexical visibility of updates, tensor
fields immutable, missing-doc 404s, value-type validation, duplicate ids,
unstructured rejection, response format.
"""

import pytest

from marqo_tpu.api.models.index_settings import FieldRequest, IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import UnsupportedFeatureError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.core.models.marqo_index import (FieldFeature, FieldType,
                                               IndexType)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "pu-structured"
UNSTRUCTURED = "pu-unstructured"


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    f = FieldRequest
    cfg.index_management.create_index(IndexSettings(
        type=IndexType.Structured, model="test",
        allFields=[
            f(name="text_field", type=FieldType.Text),
            f(name="text_field_filter", type=FieldType.Text,
              features=[FieldFeature.Filter]),
            f(name="text_field_lexical", type=FieldType.Text,
              features=[FieldFeature.LexicalSearch]),
            f(name="text_field_tensor", type=FieldType.Text),
            f(name="int_field_filter", type=FieldType.Int,
              features=[FieldFeature.Filter]),
            f(name="float_field_score_modifier", type=FieldType.Float,
              features=[FieldFeature.ScoreModifier]),
            f(name="bool_field_filter", type=FieldType.Bool,
              features=[FieldFeature.Filter]),
            f(name="array_text_field", type=FieldType.ArrayText,
              features=[FieldFeature.Filter]),
            f(name="array_int_field", type=FieldType.ArrayInt,
              features=[FieldFeature.Filter]),
        ],
        tensorFields=["text_field_tensor"],
    ).to_marqo_index(INDEX))
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(UNSTRUCTURED))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _seed(cfg):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=[{
            "_id": "1",
            "text_field": "text field",
            "text_field_filter": "text field filter",
            "text_field_lexical": "text field lexical",
            "text_field_tensor": "text field tensor",
            "int_field_filter": 1,
            "float_field_score_modifier": 1.0,
            "bool_field_filter": False,
            "array_text_field": ["a", "b"],
            "array_int_field": [1, 2],
        }]))
    assert res["errors"] is False, res


def _update(cfg, docs, index_name=INDEX):
    return cfg.document.partial_update_documents_by_index_name(
        index_name, docs)


class TestPartialUpdateFields:
    def test_update_text_field(self, config):
        _seed(config)
        _update(config, [{"_id": "1", "text_field": "updated text field"}])
        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        assert doc["text_field"] == "updated text field"

    def test_update_text_field_filter_visibility(self, config):
        _seed(config)
        _update(config, [{"_id": "1",
                          "text_field_filter": "updated text field filter"}])
        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        assert doc["text_field_filter"] == "updated text field filter"
        res = tensor_search.search(
            config, INDEX, text="test",
            filter="text_field_filter:(updated text field filter)")
        assert len(res["hits"]) == 1
        res = tensor_search.search(
            config, INDEX, text="test",
            filter="text_field_filter:(text field filter)")
        assert len(res["hits"]) == 0

    def test_update_text_field_lexical_visibility(self, config):
        _seed(config)
        _update(config, [{"_id": "1",
                          "text_field_lexical": "search me please"}])
        res = tensor_search.search(config, INDEX,
                                   search_method="LEXICAL",
                                   text="search me please")
        assert len(res["hits"]) == 1
        res = tensor_search.search(config, INDEX,
                                   search_method="LEXICAL",
                                   text='"text field lexical"')
        assert len(res["hits"]) == 0

    def test_update_tensor_field_rejected(self, config):
        _seed(config)
        r = _update(config, [{"_id": "1",
                              "text_field_tensor": "I can't be updated"}])
        assert r["errors"] is True
        assert "as this is a tensor field" in r["items"][0]["error"]

    def test_update_int_field_filter_and_score_modifier(self, config):
        _seed(config)
        _update(config, [{"_id": "1", "int_field_filter": 222,
                          "float_field_score_modifier": 33.33,
                          "bool_field_filter": True}])
        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        assert doc["int_field_filter"] == 222
        assert doc["float_field_score_modifier"] == 33.33
        assert doc["bool_field_filter"] is True
        res = tensor_search.search(config, INDEX, text="test",
                                   filter="int_field_filter:222")
        assert len(res["hits"]) == 1
        res = tensor_search.search(
            config, INDEX, text="test",
            score_modifiers={"add_to_score": [
                {"field_name": "float_field_score_modifier",
                 "weight": 10}]})
        assert res["hits"][0]["_score"] > 300

    def test_update_array_text_field_filter(self, config):
        _seed(config)
        _update(config, [{"_id": "1", "array_text_field": ["x", "y"]}])
        res = tensor_search.search(config, INDEX, text="test",
                                   filter="array_text_field:x")
        assert len(res["hits"]) == 1
        res = tensor_search.search(config, INDEX, text="test",
                                   filter="array_text_field:a")
        assert len(res["hits"]) == 0


class TestPartialUpdateErrors:
    def test_update_a_document_that_does_not_exist(self, config):
        r = _update(config, [{"_id": "1", "text_field": "x"}])
        assert r["errors"] is True
        assert "Document does not exist in the index" in \
            r["items"][0]["error"]
        assert r["items"][0]["status"] == 404
        assert config.monitoring.get_index_stats(
            INDEX)["numberOfDocuments"] == 0

    def test_update_a_document_without_id(self, config):
        r = _update(config, [{"text_field": "x"}])
        assert r["errors"] is True
        assert "'_id' is a required field" in r["items"][0]["error"]
        assert r["items"][0]["status"] == 400

    def test_update_non_existent_field(self, config):
        _seed(config)
        r = _update(config, [{"_id": "1", "non_existent_field": "v"}])
        assert r["errors"] is True
        assert "Invalid field name" in r["items"][0]["error"]
        assert r["items"][0]["status"] == 400

    @pytest.mark.parametrize("update", [
        {"int_field_filter": "should be an integer"},
        {"text_field": 1},
        {"bool_field_filter": "True"},
        {"float_field_score_modifier": "1.34"},
        {"array_text_field": "should be a list"},
        {"array_int_field": "should be a list"},
        {"array_int_field": [1, "should be an integer", 3]},
        {"array_text_field": ["string", 2, "string"]},
    ])
    def test_update_with_incorrect_field_value(self, config, update):
        _seed(config)
        doc = {"_id": "1", **update}
        r = _update(config, [doc])
        assert r["errors"] is True, update
        assert r["items"][0]["status"] >= 400

    def test_unstructured_index_rejected(self, config):
        with pytest.raises(UnsupportedFeatureError) as e:
            _update(config, [{"_id": "1", "x": "y"}],
                    index_name=UNSTRUCTURED)
        assert "not supported for unstructured" in str(e.value)

    def test_duplicate_ids_in_one_batch_last_wins(self, config):
        _seed(config)
        r = _update(config, [
            {"_id": "1", "text_field": "first update"},
            {"_id": "1", "text_field": "second update"},
        ])
        assert len(r["items"]) == 1
        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        assert doc["text_field"] == "second update"

    def test_update_response_format(self, config):
        _seed(config)
        r = _update(config, [{"_id": "1", "text_field": "ok"},
                             {"_id": "missing", "text_field": "x"}])
        assert "errors" in r and "items" in r
        assert "processingTimeMs" in r and "index_name" in r
        assert r["index_name"] == INDEX
        statuses = sorted(i["status"] for i in r["items"])
        assert statuses == [200, 404]


class TestPartialUpdateGaps:
    """Remaining reference cases: batch bounds, dependent fields,
    multi-field updates, bool/float filter visibility."""

    def test_too_many_documents_rejected(self, config, monkeypatch):
        from marqo_tpu.api.exceptions import BadRequestError
        _seed(config)
        docs = [{"_id": "1"}] * 129
        with pytest.raises(BadRequestError) as e:
            _update(config, docs)
        assert "exceeds limit of 128" in str(e.value)
        monkeypatch.setenv("MARQO_MAX_DOCUMENTS_BATCH_SIZE", "129")
        r = _update(config, docs)  # same size passes with a higher limit
        assert r["errors"] is False

    def test_empty_request_rejected(self, config):
        from marqo_tpu.api.exceptions import BadRequestError
        with pytest.raises(BadRequestError) as e:
            _update(config, [])
        assert "Received empty update_documents request" in str(e.value)

    def test_update_multimodal_dependent_field_rejected(self, config):
        f = FieldRequest
        config.index_management.create_index(IndexSettings(
            type=IndexType.Structured, model="test",
            allFields=[
                f(name="dependent_field_1", type=FieldType.Text),
                f(name="dependent_field_2", type=FieldType.Text),
                f(name="combo", type=FieldType.MultimodalCombination,
                  dependentFields={"dependent_field_1": 0.5,
                                   "dependent_field_2": 0.5}),
            ],
            tensorFields=["combo"]).to_marqo_index("pu-multimodal"))
        config.index_meta_cache.populate()
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="pu-multimodal", docs=[{
                "_id": "1",
                "dependent_field_1": "dependent field 1",
                "dependent_field_2": "dependent field 2"}]))
        assert res["errors"] is False
        r = _update(config, [{"_id": "1",
                              "dependent_field_1": "updated"}],
                    index_name="pu-multimodal")
        assert r["errors"] is True
        assert "dependent field" in r["items"][0]["error"]
        assert r["items"][0]["status"] == 400

    def test_update_multiple_fields_simultaneously(self, config):
        _seed(config)
        r = _update(config, [{
            "_id": "1",
            "text_field": "updated text field",
            "int_field_filter": 42,
            "float_field_score_modifier": 2.5,
            "bool_field_filter": True}])
        assert r["errors"] is False
        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        assert doc["text_field"] == "updated text field"
        assert doc["int_field_filter"] == 42
        assert doc["float_field_score_modifier"] == 2.5
        assert doc["bool_field_filter"] is True

    def test_update_bool_field_filter_visibility(self, config):
        _seed(config)
        r = _update(config, [{"_id": "1", "bool_field_filter": True}])
        assert r["errors"] is False
        hits = tensor_search.search(
            config, INDEX, text="text", filter="bool_field_filter:true")
        assert {h["_id"] for h in hits["hits"]} == {"1"}
        hits = tensor_search.search(
            config, INDEX, text="text", filter="bool_field_filter:false")
        assert hits["hits"] == []

    def test_add_docs_honors_reference_batch_env(self, config,
                                                 monkeypatch):
        """Add-documents enforces MARQO_MAX_DOCUMENTS_BATCH_SIZE too
        (reference add_docs_params.py:78-93)."""
        monkeypatch.setenv("MARQO_MAX_DOCUMENTS_BATCH_SIZE", "2")
        # reference add_docs_params.py:86-93: BadRequestError from the
        # AddDocsParams validator
        from marqo_tpu.api.exceptions import BadRequestError
        with pytest.raises(BadRequestError) as e:
            tensor_search.add_documents(config, AddDocsParams(
                index_name=INDEX,
                docs=[{"text_field": f"d{i}"} for i in range(3)]))
        assert "exceeds limit of 2" in str(e.value)


class TestMultiThreadingUpdate:
    """Reference test_partial_document_update.py:641-793 — concurrent
    partial updates must never corrupt a document. (The reference's
    Thread(target=fn(...)) construction actually runs sequentially; here
    the updates are genuinely concurrent.)"""

    def test_multi_threading_update(self, config):
        import random
        import threading
        _seed(config)
        fields = ["text_field", "text_field_filter", "text_field_lexical",
                  "text_field_tensor", "int_field_filter",
                  "float_field_score_modifier", "bool_field_filter"]

        errors = []

        def randomly_update_document(n_updates=20):
            rng = random.Random()
            for _ in range(n_updates):
                doc = {"_id": "1"}
                for field in rng.sample(fields, 3):
                    if field.startswith("text_field"):
                        doc[field] = "text field" + str(rng.randint(1, 100))
                    elif field.startswith("int_field"):
                        doc[field] = rng.randint(1, 100)
                    elif field.startswith("float_field"):
                        doc[field] = rng.uniform(1, 100)
                    else:
                        doc[field] = bool(rng.getrandbits(1))
                try:
                    _update(config, [doc])
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        threads = [threading.Thread(target=randomly_update_document)
                   for _ in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []

        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        for f in ["text_field", "text_field_filter", "text_field_lexical",
                  "text_field_tensor"]:
            assert doc[f].startswith("text field"), doc
        assert 1 <= doc["int_field_filter"] <= 100
        assert isinstance(doc["bool_field_filter"], bool)
        # the tensor facets survive concurrent non-tensor updates
        full = tensor_search.get_document_by_id(config, INDEX, "1",
                                                show_vectors=True)
        assert full["_tensor_facets"], full

    def test_multi_threading_update_for_large_score_modifier_fields(
            self, config):
        """Reference :722-793 — hammer many score-modifier float fields
        concurrently, then verify every one still modifies scores by
        exactly its value."""
        import random
        import threading

        big = "pu-large-score-mods"
        n_fields = 100
        config.index_management.create_index(IndexSettings(
            type=IndexType.Structured, model="test",
            allFields=[FieldRequest(name=f"float_field_{i}",
                                    type=FieldType.Float,
                                    features=[FieldFeature.ScoreModifier])
                       for i in range(n_fields)] +
                      [FieldRequest(name="text_field_tensor",
                                    type=FieldType.Text)],
            tensorFields=["text_field_tensor"],
        ).to_marqo_index(big))
        config.index_meta_cache.populate()

        original = {f"float_field_{i}": float(i) for i in range(n_fields)}
        original["text_field_tensor"] = "text field tensor"
        original["_id"] = "1"
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=big, docs=[original]))
        assert res["errors"] is False, res

        errors = []

        def randomly_update_document(n_updates=20):
            rng = random.Random()
            for _ in range(n_updates):
                doc = {"_id": "1"}
                for i in rng.sample(range(n_fields), 10):
                    doc[f"float_field_{i}"] = rng.uniform(1, 100)
                try:
                    config.document.partial_update_documents_by_index_name(
                        big, [doc])
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        threads = [threading.Thread(target=randomly_update_document)
                   for _ in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []

        doc = tensor_search.get_document_by_id(config, big, "1")
        for i in range(n_fields):
            assert 0 <= doc[f"float_field_{i}"] <= 100, i

        # final deterministic update, then every field modifies the score
        final = {f"float_field_{i}": 1.0 for i in range(n_fields)}
        final["_id"] = "1"
        config.document.partial_update_documents_by_index_name(big, [final])
        base = tensor_search.search(config, big, text="test")["hits"][0][
            "_score"]
        for i in range(0, n_fields, 10):
            modified = tensor_search.search(
                config, big, text="test",
                score_modifiers={"add_to_score": [
                    {"field_name": f"float_field_{i}", "weight": 1.0}
                ]})["hits"][0]["_score"]
            assert abs(modified - (base + 1.0)) < 0.1, i
