"""batchVectorisationMode semantics (reference add_docs_params.py:18-21,62 +
add_documents_handler.py:264-373): PER_DOCUMENT (default) and PER_FIELD
isolate encode failures to the poisoned document; PER_BATCH fails the whole
request with InternalError. The TPU build always encodes one large batch
first and only re-encodes per group to isolate a failure."""

import pytest

from marqo_tpu.api.exceptions import InternalError
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import (AddDocsParams,
                                                   BatchVectorisationMode)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

POISON = "__poison_token__"


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index("bvm-index"))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


@pytest.fixture
def poisoned_vectorise(monkeypatch):
    """Make the real vectorise raise whenever any content contains POISON —
    simulating a content-dependent model failure at encode time."""
    real = inference.vectorise
    calls = {"n": 0}

    def wrapper(model_name, content, *args, **kwargs):
        calls["n"] += 1
        items = content if isinstance(content, list) else [content]
        if any(isinstance(c, str) and POISON in c for c in items):
            raise RuntimeError("model exploded on poisoned content")
        return real(model_name, content, *args, **kwargs)

    monkeypatch.setattr(inference, "vectorise", wrapper)
    return calls


def _add(cfg, docs, mode=None, **kwargs):
    params = AddDocsParams(
        index_name="bvm-index", docs=docs, tensor_fields=["title", "blurb"],
        **({"batch_vectorisation_mode": mode} if mode else {}), **kwargs)
    return tensor_search.add_documents(cfg, params)


DOCS = [
    {"_id": "good1", "title": "a fine document"},
    {"_id": "bad", "title": f"this one is {POISON} and breaks the model"},
    {"_id": "good2", "title": "another fine document"},
]


class TestDefaults:
    def test_default_mode_is_per_document(self):
        params = AddDocsParams(index_name="x", docs=[{"t": "v"}])
        assert params.batch_vectorisation_mode == \
            BatchVectorisationMode.PER_DOCUMENT

    def test_happy_path_single_batched_call(self, config,
                                            poisoned_vectorise):
        res = _add(config, [{"_id": "a", "title": "hello"},
                            {"_id": "b", "title": "world"}])
        assert res["errors"] is False
        # one modality present → exactly one vectorise call, no fallback
        assert poisoned_vectorise["n"] == 1


class TestPerDocument:
    def test_poisoned_doc_fails_alone(self, config, poisoned_vectorise):
        res = _add(config, DOCS)  # default per_document
        statuses = {i["_id"]: i["status"] for i in res["items"]}
        assert statuses["good1"] == 200
        assert statuses["good2"] == 200
        assert statuses["bad"] == 500
        bad_item = next(i for i in res["items"] if i["_id"] == "bad")
        assert "vectoris" in bad_item["error"].lower()
        assert config.engine.doc_count("bvm-index") == 2
        # good docs are searchable
        out = tensor_search.search(config, "bvm-index", text="fine document")
        assert {h["_id"] for h in out["hits"]} == {"good1", "good2"}

    def test_response_preserves_request_order(self, config,
                                              poisoned_vectorise):
        res = _add(config, DOCS)
        assert [i["_id"] for i in res["items"]] == ["good1", "bad", "good2"]

    def test_multi_field_doc_fails_whole_doc(self, config,
                                             poisoned_vectorise):
        docs = [{"_id": "d1", "title": "ok", "blurb": f"{POISON} here"},
                {"_id": "d2", "title": "clean", "blurb": "also clean"}]
        res = _add(config, docs)
        statuses = {i["_id"]: i["status"] for i in res["items"]}
        assert statuses["d1"] == 500 and statuses["d2"] == 200
        assert config.engine.get("bvm-index", "d1") is None


class TestPerField:
    def test_field_failure_fails_its_document(self, config,
                                              poisoned_vectorise):
        docs = [{"_id": "d1", "title": "ok title",
                 "blurb": f"{POISON} blurb"},
                {"_id": "d2", "title": "clean", "blurb": "clean too"}]
        res = _add(config, docs, mode=BatchVectorisationMode.PER_FIELD)
        statuses = {i["_id"]: i["status"] for i in res["items"]}
        assert statuses["d1"] == 500 and statuses["d2"] == 200
        # reference remove_doc: no partial doc with only the good field
        assert config.engine.get("bvm-index", "d1") is None


class TestPerBatch:
    def test_failure_raises_internal_error(self, config, poisoned_vectorise):
        with pytest.raises(InternalError, match="vectorising batch"):
            _add(config, DOCS, mode=BatchVectorisationMode.PER_BATCH)
        assert config.engine.doc_count("bvm-index") == 0

    def test_happy_path_succeeds(self, config):
        res = _add(config, [{"_id": "a", "title": "hello"}],
                   mode=BatchVectorisationMode.PER_BATCH)
        assert res["errors"] is False


class TestHttpSurface:
    def test_param_accepted_and_invalid_value_rejected(self, config):
        from marqo_tpu.api.models.requests import AddDocsBodyParams
        body = AddDocsBodyParams(
            documents=[{"t": "v"}], tensorFields=["t"],
            batchVectorisationMode="per_field")
        assert body.batchVectorisationMode == \
            BatchVectorisationMode.PER_FIELD
        with pytest.raises(Exception):
            AddDocsBodyParams(documents=[{"t": "v"}],
                              batchVectorisationMode="per_chunk")
