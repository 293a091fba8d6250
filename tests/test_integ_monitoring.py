"""Ported reference integ tests: index stats monitoring.

Source: /root/reference/tests/core/monitoring/test_monitoring.py —
numberOfDocuments / numberOfVectors across tensor/non-tensor/mixed docs,
sequential add+delete accounting, long-text multi-chunk counting,
missing-index error.
"""

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "mon-index"


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


def _stats(cfg):
    s = cfg.monitoring.get_index_stats(INDEX)
    return s["numberOfDocuments"], s["numberOfVectors"]


def _add(cfg, docs):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=["title"]))
    assert res["errors"] is False, res


class TestIndexStats:
    def test_empty_index(self, config):
        assert _stats(config) == (0, 0)

    def test_docs_with_tensor_fields(self, config):
        _add(config, [{"title": "2"}, {"title": "2"}, {"title": "62"}])
        assert _stats(config) == (3, 3)

    def test_docs_without_tensor_fields(self, config):
        _add(config, [{"desc": "2"}, {"desc": "2"}, {"desc": "62"}])
        assert _stats(config) == (3, 0)

    def test_mixed_docs(self, config):
        _add(config, [{"title": "2"}, {"title": "2"}, {"desc": "62"}])
        assert _stats(config) == (3, 2)

    def test_sequential_indexing_and_deletion(self, config):
        _add(config, [{"_id": "1", "title": "2"},
                      {"_id": "2", "title": "2"},
                      {"_id": "3", "title": "62"}])
        assert _stats(config) == (3, 3)
        _add(config, [{"_id": "4", "desc": "2"},
                      {"_id": "5", "title": "2"},
                      {"_id": "6", "desc": "62"}])
        assert _stats(config) == (6, 4)
        tensor_search.delete_documents(config, INDEX, ["1", "4"])
        assert _stats(config) == (4, 3)
        # overwrite doc 5's tensor field away
        _add(config, [{"_id": "5", "desc": "no tensor now"}])
        assert _stats(config) == (4, 2)

    def test_long_text_multiple_chunks(self, config):
        """A long text field yields multiple chunks → multiple vectors for
        one document (reference test_get_index_stats_longText)."""
        long_text = ". ".join(f"sentence number {i} with several words"
                              for i in range(40))
        _add(config, [{"_id": "1", "title": long_text}])
        docs, vectors = _stats(config)
        assert docs == 1
        assert vectors > 1

    def test_missing_index_fails(self, config):
        with pytest.raises(IndexNotFoundError):
            config.monitoring.get_index_stats("ghost-stats-index")
