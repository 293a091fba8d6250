"""Ported reference tests: add_documents use_existing_tensors.

Source:
/root/reference/tests/tensor_search/test_add_documents_use_existing_tensors.py
— unchanged content reuses stored vectors WITHOUT re-vectorising; changed/
new fields vectorise only the delta; unknown ids fall back to full
vectorisation; retensorising a previously non-tensor field works.
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "uet-index"


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(INDEX))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


@pytest.fixture
def vectorise_spy(monkeypatch):
    calls = []
    real = inference.vectorise

    def spy(*args, **kwargs):
        content = kwargs.get("content", args[1] if len(args) > 1 else None)
        calls.append(content)
        return real(*args, **kwargs)

    import marqo_tpu.core.add_documents as ad
    monkeypatch.setattr(ad.inference, "vectorise", spy)
    return calls


def _add(cfg, docs, tensor_fields=("text_field_1", "text_field_2"),
         **kwargs):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=list(tensor_fields),
        **kwargs))


class TestUseExistingTensors:
    def test_no_change_skips_vectorise(self, config, vectorise_spy):
        doc = {"_id": "1", "text_field_1": "content 1"}
        _add(config, [doc])
        assert len(vectorise_spy) == 1
        vectorise_spy.clear()
        res = _add(config, [doc], use_existing_tensors=True)
        assert res["errors"] is False
        assert len(vectorise_spy) == 0, \
            "unchanged content must reuse stored vectors"
        got = tensor_search.get_document_by_id(config, INDEX, "1",
                                               show_vectors=True)
        assert len(got["_tensor_facets"]) == 1
        assert got["_tensor_facets"][0]["text_field_1"] == "content 1"
        search = tensor_search.search(config, INDEX, text="content")
        assert search["hits"][0]["text_field_1"] == "content 1"

    def test_new_fields_vectorise_only_delta(self, config, vectorise_spy):
        _add(config, [{"_id": "1", "text_field_1": "content 1"}])
        vectorise_spy.clear()
        res = _add(config, [{"_id": "1", "text_field_2": "content 2"}],
                   use_existing_tensors=True)
        assert res["errors"] is False
        # the new field vectorises; the old doc is REPLACED (field gone)
        assert len(vectorise_spy) == 1
        got = tensor_search.get_document_by_id(config, INDEX, "1",
                                               show_vectors=True)
        assert len(got["_tensor_facets"]) == 1
        assert got["_tensor_facets"][0]["text_field_2"] == "content 2"
        assert "text_field_1" not in got

    def test_changed_content_revectorises(self, config, vectorise_spy):
        _add(config, [{"_id": "1", "text_field_1": "content 1"}])
        vectorise_spy.clear()
        _add(config, [{"_id": "1", "text_field_1": "changed content"}],
             use_existing_tensors=True)
        assert len(vectorise_spy) == 1
        got = tensor_search.get_document_by_id(config, INDEX, "1",
                                               show_vectors=True)
        assert got["_tensor_facets"][0]["text_field_1"] == "changed content"

    def test_unknown_id_inserts_normally(self, config, vectorise_spy):
        res = _add(config, [{"_id": "brand-new",
                             "text_field_1": "content 1"}],
                   use_existing_tensors=True)
        assert res["errors"] is False
        assert len(vectorise_spy) == 1
        got = tensor_search.get_document_by_id(config, INDEX, "brand-new",
                                               show_vectors=True)
        assert len(got["_tensor_facets"]) == 1

    def test_no_id_inserts(self, config):
        d = {"text_field_1": "content 1"}
        res = _add(config, [d], use_existing_tensors=True)
        assert res["errors"] is False
        res = _add(config, [d, d], use_existing_tensors=True)
        assert res["errors"] is False
        stats = config.monitoring.get_index_stats(INDEX)
        assert stats["numberOfDocuments"] == 3  # all got fresh uuids

    def test_parity_with_and_without_flag(self, config):
        """A fresh doc added with use_existing_tensors must equal one
        added without (same embeddings for same content)."""
        doc = {"_id": "a", "text_field_1": "identical content"}
        _add(config, [doc])
        plain = tensor_search.get_document_by_id(config, INDEX, "a",
                                                 show_vectors=True)
        _add(config, [{**doc, "_id": "b"}], use_existing_tensors=True)
        flagged = tensor_search.get_document_by_id(config, INDEX, "b",
                                                   show_vectors=True)
        np.testing.assert_allclose(
            plain["_tensor_facets"][0]["_embedding"],
            flagged["_tensor_facets"][0]["_embedding"], atol=1e-6)

    def test_multimodal_unchanged_reuses(self, config, vectorise_spy):
        """Unchanged multimodal combo (same subfields, content AND weights)
        must reuse the stored combined embedding (reference
        tensor_fields_container.py multimodal populate conditions)."""
        doc = {"_id": "1", "title": "a photo", "caption": "of a cat"}
        mappings = {"combo": {"type": "multimodal_combination",
                              "weights": {"title": 0.6, "caption": 0.4}}}
        res = _add(config, [doc], tensor_fields=["combo"],
                   mappings=mappings)
        assert res["errors"] is False
        assert len(vectorise_spy) > 0
        before = tensor_search.get_document_by_id(
            config, INDEX, "1", show_vectors=True)
        vectorise_spy.clear()
        res = _add(config, [doc], tensor_fields=["combo"],
                   mappings=mappings, use_existing_tensors=True)
        assert res["errors"] is False
        assert len(vectorise_spy) == 0, \
            "unchanged multimodal combo must not re-vectorise"
        after = tensor_search.get_document_by_id(
            config, INDEX, "1", show_vectors=True)
        np.testing.assert_allclose(
            before["_tensor_facets"][0]["_embedding"],
            after["_tensor_facets"][0]["_embedding"], atol=1e-6)

    def test_multimodal_changed_weights_revectorises(self, config,
                                                     vectorise_spy):
        doc = {"_id": "1", "title": "a photo", "caption": "of a cat"}
        mk = lambda w1, w2: {"combo": {
            "type": "multimodal_combination",
            "weights": {"title": w1, "caption": w2}}}
        _add(config, [doc], tensor_fields=["combo"], mappings=mk(0.6, 0.4))
        before = tensor_search.get_document_by_id(
            config, INDEX, "1", show_vectors=True)
        vectorise_spy.clear()
        _add(config, [doc], tensor_fields=["combo"], mappings=mk(0.1, 0.9),
             use_existing_tensors=True)
        assert len(vectorise_spy) > 0, \
            "changed weights must re-vectorise the combo"
        after = tensor_search.get_document_by_id(
            config, INDEX, "1", show_vectors=True)
        assert not np.allclose(
            before["_tensor_facets"][0]["_embedding"],
            after["_tensor_facets"][0]["_embedding"])

    def test_multimodal_changed_subfield_content_revectorises(
            self, config, vectorise_spy):
        mappings = {"combo": {"type": "multimodal_combination",
                              "weights": {"title": 0.6, "caption": 0.4}}}
        _add(config, [{"_id": "1", "title": "a photo",
                       "caption": "of a cat"}],
             tensor_fields=["combo"], mappings=mappings)
        vectorise_spy.clear()
        _add(config, [{"_id": "1", "title": "a photo",
                       "caption": "of a dog"}],
             tensor_fields=["combo"], mappings=mappings,
             use_existing_tensors=True)
        assert len(vectorise_spy) > 0, \
            "changed subfield content must re-vectorise the combo"

    def test_multimodal_params_hidden_from_reads(self, config):
        doc = {"_id": "1", "title": "a photo", "caption": "of a cat"}
        mappings = {"combo": {"type": "multimodal_combination",
                              "weights": {"title": 0.6, "caption": 0.4}}}
        _add(config, [doc], tensor_fields=["combo"], mappings=mappings)
        got = tensor_search.get_document_by_id(config, INDEX, "1")
        assert "marqo__multimodal_params" not in got
        hits = tensor_search.search(config, INDEX, text="photo")["hits"]
        assert hits and "marqo__multimodal_params" not in hits[0]

    def test_retensorize_previously_plain_field(self, config,
                                                vectorise_spy):
        """A field stored without tensors gets vectorised when it becomes
        a tensor field (test_use_existing_tensors_retensorize_fields)."""
        _add(config, [{"_id": "1", "text_field_1": "content 1"}],
             tensor_fields=[])
        got = tensor_search.get_document_by_id(config, INDEX, "1",
                                               show_vectors=True)
        assert got["_tensor_facets"] == []
        vectorise_spy.clear()
        _add(config, [{"_id": "1", "text_field_1": "content 1"}],
             tensor_fields=["text_field_1"], use_existing_tensors=True)
        assert len(vectorise_spy) == 1
        got = tensor_search.get_document_by_id(config, INDEX, "1",
                                               show_vectors=True)
        assert len(got["_tensor_facets"]) == 1
