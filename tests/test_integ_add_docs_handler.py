"""Port of reference tests/core/vespa_index/test_add_documents_handler.py.

The reference file drives a DummyAddDocumentsHandler against mocked Vespa
feed/get batches; here the real AddDocumentsHandler runs against the real
in-process engine (with vectorise monkeypatched where the reference mocks
s2_inference.vectorise), asserting the same externally-observable contract:
duplicate-id last-wins semantics (add_documents_handler.py:140-157),
per-item error envelopes with exact reference messages, generated-id
masking in error items, and request-order responses.

The reference's vectorise-strategy call-count tests (PER_FIELD=3 calls /
PER_DOCUMENT=2 / PER_BATCH=1, :223-248) do not port: marqo_tpu batches all
chunks into one bucketed device call regardless of mode (the mode governs
failure isolation — documented TPU divergence, tests/
test_batch_vectorisation_mode.py covers that matrix). The Vespa feed
status→message mapping (:161-219 items 1-3) has no surface here: the
in-process engine raises Python errors, surfaced as status-500
backend_error items.
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "handler-port-index"


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


def _add(cfg, docs, **kwargs):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs,
        tensor_fields=kwargs.pop("tensor_fields", ["field1"]), **kwargs))


class TestMainWorkflow:
    def test_add_documents_main_workflow_happy_path(self, config):
        """3 docs (one with extra scalar/list fields) all land with 200s in
        request order (reference :57-105)."""
        res = _add(config, [
            {"_id": "1", "field1": "hello", "field2": 2.0},
            {"_id": "2", "field1": "hello again", "field4": ["abcd"]},
            {"_id": "3", "field2": ["de"]},
        ])
        assert res["errors"] is False
        assert [i["_id"] for i in res["items"]] == ["1", "2", "3"]
        assert all(i["status"] == 200 for i in res["items"])

    def test_add_documents_should_skip_duplicate_documents(self, config):
        """The LAST doc with a duplicated _id wins; the first is silently
        superseded — exactly one item, one stored doc with only the later
        fields (reference :108-127)."""
        res = _add(config, [
            {"_id": "1", "field1": "hello", "field2": 2.0},
            {"_id": "1", "field4": ["de"], "field6": "later text"},
        ], tensor_fields=["field1", "field6"])
        assert res["errors"] is False
        assert len(res["items"]) == 1
        assert res["items"][0]["_id"] == "1"
        doc = tensor_search.get_document_by_id(config, INDEX, "1")
        assert doc["field4"] == ["de"]
        assert "field1" not in doc  # first occurrence fully discarded

    def test_add_documents_should_skip_duplicate_documents_even_when_the_latter_one_errors_out(
            self, config):
        """When the surviving (last) duplicate fails, the earlier one must
        NOT be resurrected: one error item, nothing fed (reference
        :130-158)."""
        res = _add(config, [
            {"_id": "1", "field1": "hello", "field2": 2.0},
            {"_id": "1", "field4": ["de"], "field5": {"a": "not numeric"}},
        ])
        assert res["errors"] is True
        assert len(res["items"]) == 1
        assert res["items"][0]["status"] == 400
        from marqo_tpu.api.exceptions import DocumentNotFoundError
        with pytest.raises(DocumentNotFoundError):
            tensor_search.get_document_by_id(config, INDEX, "1")

    def test_add_documents_should_handle_various_errors(self, config):
        """Per-item error envelopes carry the reference's exact messages
        and codes (reference :161-219, the non-Vespa rows)."""
        res = _add(config, [
            {"_id": "1", "field1": "hello"},                     # ok
            {"_id": [5], "field4": ["de"]},                      # bad id type
            {"field4": ["de"],
             "field5": "a very large string object" * 10000},    # too large
            {},                                                  # empty doc
            [2.0] * 32,                                          # not a dict
        ])
        assert res["errors"] is True
        items = res["items"]
        assert [i["status"] for i in items] == [200, 400, 400, 400, 400]
        assert items[1]["_id"] == ""
        assert items[1]["message"] == (
            "Document _id must be a string type! "
            "Received _id [5] of type `list`")
        assert items[1]["code"] == "invalid_document_id"
        assert items[2]["_id"] == ""
        assert items[2]["message"] == (
            "Document with length `260032` exceeds the allowed document "
            "size limit of [100000].")
        assert items[2]["code"] == "doc_too_large"
        assert items[3]["message"] == "Can't index an empty dict."
        assert items[3]["code"] == "invalid_argument"
        assert items[4]["message"] == "Docs must be dicts"
        assert items[4]["code"] == "invalid_argument"

    def test_doc_too_large_message_includes_id_when_present(self, config):
        """validate_doc embeds the _id when the oversized doc has one
        (reference validation.py:340-343)."""
        res = _add(config, [
            {"_id": "big-doc", "field5": "x" * 200000},
        ])
        assert res["errors"] is True
        assert res["items"][0]["message"].startswith(
            "Document _id:`big-doc` with length `")
        assert res["items"][0]["message"].endswith(
            "exceeds the allowed document size limit of [100000].")


class TestResponseCollectorContract:
    def test_error_for_generated_id_doc_masks_id(self, config, monkeypatch):
        """A doc without _id that fails after id generation reports id ""
        — the generated id is never revealed on failure (reference
        :405-414)."""
        real = inference.vectorise

        def poisoned(model_name, content, *args, **kwargs):
            items = content if isinstance(content, list) else [content]
            if any(isinstance(c, str) and "POISON" in c for c in items):
                raise RuntimeError("vectorise error")
            return real(model_name, content, *args, **kwargs)

        monkeypatch.setattr(inference, "vectorise", poisoned)
        monkeypatch.setattr(inference, "vectorise_async", poisoned)
        res = _add(config, [
            {"field1": "POISON content, no id"},
            {"_id": "ok", "field1": "fine"},
        ])
        assert res["errors"] is True
        by_status = {i["status"]: i for i in res["items"]}
        assert by_status[200]["_id"] == "ok"
        failed = [i for i in res["items"] if i["status"] != 200][0]
        assert failed["_id"] == ""

    def test_success_for_generated_id_doc_returns_generated_id(self, config):
        """Persisted docs DO return their generated id (reference
        :438-462: doc_id3 with original None comes back by its id)."""
        res = _add(config, [{"field1": "no id, succeeds"}])
        assert res["errors"] is False
        assert len(res["items"]) == 1
        assert res["items"][0]["status"] == 200
        generated = res["items"][0]["_id"]
        assert generated != ""
        doc = tensor_search.get_document_by_id(config, INDEX, generated)
        assert doc["field1"] == "no id, succeeds"

    def test_items_in_request_order_with_mixed_outcomes(self, config):
        """Errors and successes interleave back in request order
        (reference :449-462 ordering semantics)."""
        res = _add(config, [
            {"_id": "a", "field1": "fine"},
            {},                                   # error
            {"_id": "b", "field1": "also fine"},
            {"_id": [1]},                         # error
        ])
        assert [i["status"] for i in res["items"]] == [200, 400, 200, 400]
        assert res["items"][0]["_id"] == "a"
        assert res["items"][2]["_id"] == "b"

    def test_error_items_carry_message_error_and_code(self, config):
        """Error items mirror message into error and carry a code
        (reference MarqoAddDocumentsItem shape, :350-360)."""
        res = _add(config, [{}])
        item = res["items"][0]
        assert item["message"] == item["error"] == "Can't index an empty dict."
        assert item["code"] == "invalid_argument"
        assert item["status"] == 400
