"""Cross-batch ingest vectorise/feed pipeline (VERDICT r3 item 2).

The 1-deep pipeline in core/add_documents.py splits large text-only
requests into sub-batches: sub-batch i's tokenize+device dispatch runs
before sub-batch i-1's fetch+feed, hiding device compute and the
host-device fetch behind host work. The reference runs these stages
strictly serially (add_documents_handler.py:123-181).

These tests force a tiny sub-batch via MARQO_TPU_INGEST_PIPELINE_SUB_BATCH
so the pipeline engages on small doc counts, then assert bit-equality with
the serial path, correct per-doc failure isolation (the async path replays
failures through the synchronous isolation machinery), and the guard rails
that must disable pipelining (PER_BATCH mode, media fields, small
requests).
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.add_documents import AddDocumentsHandler
from marqo_tpu.core.models.add_docs_params import (AddDocsParams,
                                                   BatchVectorisationMode)
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "pipe-index"
POISON = "__poison_token__"


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
def tiny_sub_batch(monkeypatch):
    monkeypatch.setenv("MARQO_TPU_INGEST_PIPELINE_SUB_BATCH", "3")


@pytest.fixture
def pipeline_spy(monkeypatch):
    """Count _resolve_and_feed calls: >0 means the pipeline branch ran."""
    calls = {"n": 0}
    real = AddDocumentsHandler._resolve_and_feed

    def spy(self, chunk, handle, metrics, collector):
        calls["n"] += 1
        return real(self, chunk, handle, metrics, collector)

    monkeypatch.setattr(AddDocumentsHandler, "_resolve_and_feed", spy)
    return calls


def _docs(n, prefix="doc"):
    return [{"_id": f"{prefix}{i}", "title": f"document number {i}",
             "blurb": f"blurb text for item {i}"} for i in range(n)]


def _add(cfg, docs, **kwargs):
    return tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=["title", "blurb"],
        **kwargs))


def _get_embeddings(cfg, ids):
    res = tensor_search.get_documents_by_ids(cfg, INDEX, ids,
                                             show_vectors=True)
    out = {}
    for doc in res["results"]:
        for facet in doc["_tensor_facets"]:
            field = [k for k in facet if k != "_embedding"][0]
            out[(doc["_id"], field, facet[field])] = facet["_embedding"]
    return out


class TestPipelineEquivalence:
    def test_pipeline_engages_on_large_text_batches(self, config,
                                                    tiny_sub_batch,
                                                    pipeline_spy):
        res = _add(config, _docs(10))
        assert res["errors"] is False, res
        # 10 docs / sub-batch 3 -> 4 chunks -> 4 resolve_and_feed calls
        assert pipeline_spy["n"] == 4

    def test_pipelined_embeddings_equal_serial(self, config, monkeypatch):
        docs = _docs(10)
        monkeypatch.setenv("MARQO_TPU_INGEST_PIPELINE_SUB_BATCH", "0")
        res = _add(config, docs)
        assert res["errors"] is False, res
        serial = _get_embeddings(config, [d["_id"] for d in docs])

        tensor_search.delete_documents(config, INDEX,
                                       [d["_id"] for d in docs])
        monkeypatch.setenv("MARQO_TPU_INGEST_PIPELINE_SUB_BATCH", "3")
        res = _add(config, docs)
        assert res["errors"] is False, res
        piped = _get_embeddings(config, [d["_id"] for d in docs])

        assert serial.keys() == piped.keys()
        for key in serial:
            np.testing.assert_allclose(serial[key], piped[key], atol=1e-6)

    def test_response_order_and_counts(self, config, tiny_sub_batch):
        docs = _docs(8)
        res = _add(config, docs)
        assert [item["_id"] for item in res["items"]] == \
            [d["_id"] for d in docs]
        assert all(item["status"] == 200 for item in res["items"])


class TestPipelineFailureIsolation:
    def test_poisoned_doc_fails_alone_mid_pipeline(self, config,
                                                   tiny_sub_batch,
                                                   monkeypatch):
        """A poisoned doc in the middle chunk fails per-doc (the async
        encode replays through the synchronous isolation path); docs in
        other chunks and clean docs in the same chunk still succeed."""
        real_async = inference.vectorise_async
        real_sync = inference.vectorise

        def poisoned(content):
            items = content if isinstance(content, list) else [content]
            return any(isinstance(c, str) and POISON in c for c in items)

        def async_wrapper(model_name, content, *args, **kwargs):
            if poisoned(content):
                raise RuntimeError("model exploded on poisoned content")
            return real_async(model_name, content, *args, **kwargs)

        def sync_wrapper(model_name, content, *args, **kwargs):
            if poisoned(content):
                raise RuntimeError("model exploded on poisoned content")
            return real_sync(model_name, content, *args, **kwargs)

        monkeypatch.setattr(inference, "vectorise_async", async_wrapper)
        monkeypatch.setattr(inference, "vectorise", sync_wrapper)

        docs = _docs(9)
        docs[4]["title"] = f"this one is {POISON} and breaks the model"
        res = _add(config, docs)
        assert res["errors"] is True
        by_id = {item["_id"]: item for item in res["items"]}
        assert by_id["doc4"]["status"] >= 400
        for i in [0, 1, 2, 3, 5, 6, 7, 8]:
            assert by_id[f"doc{i}"]["status"] == 200, by_id[f"doc{i}"]

    def test_resolve_time_failure_replays_through_isolation(
            self, config, tiny_sub_batch, monkeypatch):
        """Failure surfacing only at resolve() (fetch time) must also fall
        back to the synchronous isolation path, not crash the request."""
        real_async = inference.vectorise_async

        def async_late_fail(model_name, content, *args, **kwargs):
            items = content if isinstance(content, list) else [content]
            if any(isinstance(c, str) and POISON in c for c in items):
                def boom():
                    raise RuntimeError("late fetch explosion")
                return boom
            return real_async(model_name, content, *args, **kwargs)

        monkeypatch.setattr(inference, "vectorise_async", async_late_fail)

        docs = _docs(7)
        docs[3]["blurb"] = f"hidden {POISON} payload"
        res = _add(config, docs)
        # the sync replay (vectorise untouched) succeeds for every doc:
        # the failure was an async-path artifact, and the replay is the
        # source of truth
        assert res["errors"] is False, res


class TestPipelineGuardRails:
    def test_per_batch_mode_disables_pipeline(self, config, tiny_sub_batch,
                                              pipeline_spy):
        res = _add(config, _docs(8),
                   batch_vectorisation_mode=BatchVectorisationMode.PER_BATCH)
        assert res["errors"] is False, res
        assert pipeline_spy["n"] == 0

    def test_small_requests_stay_serial(self, config, tiny_sub_batch,
                                        pipeline_spy):
        res = _add(config, _docs(3))
        assert res["errors"] is False, res
        assert pipeline_spy["n"] == 0

    def test_disabled_by_env_zero(self, config, monkeypatch, pipeline_spy):
        monkeypatch.setenv("MARQO_TPU_INGEST_PIPELINE_SUB_BATCH", "0")
        res = _add(config, _docs(8))
        assert res["errors"] is False, res
        assert pipeline_spy["n"] == 0
