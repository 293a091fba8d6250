"""Ported reference tests: index meta cache.

Source: /root/reference/tests/tensor_search/test_index_meta_cache.py —
search repopulates the cache on miss (works after empty_cache), unknown
index raises IndexNotFoundError, populate fills the cache, create/delete
keep the cache current, externally-created indexes (another replica
writing to the shared settings store, bypassing this process's cache)
become searchable without explicit refresh, the background refresh daemon
picks up external creates AND deletes, and a mid-add-documents cache
clear does not 500.
"""

import threading
import time

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "meta-cache-ix"


def _create(config, name, model="random"):
    """Create an index via DDL only — deliberately does NOT touch
    config.index_meta_cache (the API layer does that), simulating an
    external replica writing to the shared settings store."""
    config.index_management.create_index(
        IndexSettings(model=model).to_marqo_index(name))


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    _create(cfg, INDEX)
    cfg.index_meta_cache.populate()
    yield cfg
    cfg.index_meta_cache.stop_refresh_thread()
    inference.clear_loaded_models()


class TestIndexMetaCache:
    def test_search_works_on_cache_clear(self, config):
        with pytest.raises(IndexNotFoundError):
            tensor_search.search(config, "fresh-ix", text="some text")
        _create(config, "fresh-ix")
        tensor_search.search(config, "fresh-ix", text="some text")
        config.index_meta_cache.empty_cache()
        tensor_search.search(config, "fresh-ix", text="some text")
        assert "fresh-ix" in config.index_meta_cache.get_cache()

    def test_empty_cache(self, config):
        assert len(config.index_meta_cache.get_cache()) > 0
        config.index_meta_cache.empty_cache()
        assert len(config.index_meta_cache.get_cache()) == 0

    def test_populate_cache(self, config):
        config.index_meta_cache.empty_cache()
        assert len(config.index_meta_cache.get_cache()) == 0
        config.index_meta_cache.populate()
        assert INDEX in config.index_meta_cache.get_cache()

    def test_unknown_index_raises(self, config):
        with pytest.raises(IndexNotFoundError) as e:
            config.index_meta_cache.get_index("never-created")
        assert "not found" in str(e.value)

    def test_delete_removes_index_from_cache(self, config):
        _create(config, "to-delete")
        config.index_meta_cache.refresh_index("to-delete")
        assert "to-delete" in config.index_meta_cache.get_cache()
        config.index_management.delete_index_by_name("to-delete")
        config.index_meta_cache.remove_index("to-delete")
        assert "to-delete" not in config.index_meta_cache.get_cache()
        assert INDEX in config.index_meta_cache.get_cache()

    def test_refresh_index_of_deleted_drops_entry(self, config):
        """refresh on an externally-deleted index drops the stale entry."""
        _create(config, "ext-del")
        config.index_meta_cache.refresh_index("ext-del")
        config.index_management.delete_index_by_name("ext-del")
        config.index_meta_cache.refresh_index("ext-del")
        assert "ext-del" not in config.index_meta_cache.get_cache()

    def test_externally_created_index_searchable(self, config):
        """Another replica creates an index; this process's cache misses
        and repopulates on demand — no explicit refresh call."""
        _create(config, "external-ix")
        assert "external-ix" not in config.index_meta_cache.get_cache()
        res = tensor_search.search(config, "external-ix", text="anything")
        assert res["hits"] == []
        assert "external-ix" in config.index_meta_cache.get_cache()

    def test_lexical_search_after_cache_clear(self, config):
        d0 = {"d_one": "marqo", "_id": "abc1234",
              "the_big_field": "very unlikely theory. marqo is pretty "
                               "awesom, in the field"}
        d1 = {"some_doc_1": "some 2 marqo",
              "field_abc": "robodog is not a cat", "_id": "Jupyter_12"}
        d2 = {"exclude_me": "marqo"}
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=[d0, d1, d2],
            tensor_fields=["d_one", "some_doc_1"]))
        assert res["errors"] is False
        config.index_meta_cache.empty_cache()
        search_res = tensor_search.search(
            config, INDEX, text="Marqo", search_method="LEXICAL",
            searchable_attributes=["some_doc_1", "d_one"])
        assert {h["_id"] for h in search_res["hits"]} == \
            {"abc1234", "Jupyter_12"}

    def test_get_documents_after_cache_clear(self, config):
        tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX,
            docs=[{"some_doc_1": "some 2 marqo", "_id": "Jupyter_12"}],
            tensor_fields=[]))
        config.index_meta_cache.empty_cache()
        doc = tensor_search.get_document_by_id(config, INDEX, "Jupyter_12")
        assert doc["some_doc_1"] == "some 2 marqo"

    def test_externally_added_field_searchable(self, config):
        """Docs with brand-new fields land while this process's cache is
        stale; search on the new field still finds them (single-KNN-field
        design: field names don't gate vector retrieval)."""
        tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX,
            docs=[{"brand_new_field": "a line of text", "_id": "1234"}],
            tensor_fields=["brand_new_field"]))
        result = tensor_search.search(
            config, INDEX, text="a line of text",
            searchable_attributes=["brand_new_field"])
        assert result["hits"][0]["_id"] == "1234"

    def test_refresh_thread_picks_up_external_create_and_delete(
            self, config):
        config.index_meta_cache.start_refresh_thread(interval=0.05)
        _create(config, "bg-ix")
        deadline = time.time() + 3
        while time.time() < deadline and \
                "bg-ix" not in config.index_meta_cache.get_cache():
            time.sleep(0.05)
        assert "bg-ix" in config.index_meta_cache.get_cache()
        config.index_management.delete_index_by_name("bg-ix")
        deadline = time.time() + 3
        while time.time() < deadline and \
                "bg-ix" in config.index_meta_cache.get_cache():
            time.sleep(0.05)
        assert "bg-ix" not in config.index_meta_cache.get_cache()

    def test_cache_clear_mid_add_documents_does_not_500(self, config):
        """Another thread empties the cache while add_documents runs; the
        add must still complete (reference
        test_add_documents_to_unknown_index)."""
        stop = threading.Event()

        def clearer():
            while not stop.is_set():
                config.index_meta_cache.empty_cache()
                time.sleep(0.01)

        t = threading.Thread(target=clearer)
        t.start()
        try:
            res = tensor_search.add_documents(config, AddDocsParams(
                index_name=INDEX,
                docs=[{"Title": f"Blah{i}"} for i in range(4)],
                tensor_fields=["Title"]))
            assert res["errors"] is False
        finally:
            stop.set()
            t.join()
