"""Ported reference tests: search pagination.

Source: /root/reference/tests/tensor_search/test_pagination.py — paging
through all results equals the full result list (ids AND scores) for
LEXICAL, TENSOR, and HYBRID; negative limit/offset rejections; the
offset+limit cap.
"""

import math

import pytest

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

INDEX = "pag-index"
NUM_DOCS = 60


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(INDEX))
    cfg.index_meta_cache.populate()
    # increasing word counts → unique lexical and tensor scores
    docs = []
    for i in range(NUM_DOCS):
        title = "my title " + " ".join(f"word{i}x{j}" for j in range(i))
        docs.append({"_id": str(i), "title": title,
                     "desc": "my description"})
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX, docs=docs, tensor_fields=["title"]))
    assert res["errors"] is False
    yield cfg
    inference.clear_loaded_models()


class TestPagination:
    @pytest.mark.parametrize("method", ["LEXICAL", "TENSOR"])
    @pytest.mark.parametrize("page_size", [10, 20])
    def test_pagination_matches_full_results(self, config, method,
                                             page_size):
        full = tensor_search.search(config, INDEX, text="my title",
                                    search_method=method, limit=NUM_DOCS)
        paged = []
        for page in range(math.ceil(NUM_DOCS / page_size)):
            res = tensor_search.search(
                config, INDEX, text="my title", search_method=method,
                limit=page_size, offset=page * page_size)
            paged.extend(res["hits"])
        assert len(paged) == len(full["hits"])
        for a, b in zip(full["hits"], paged):
            assert a["_id"] == b["_id"]
            assert a["_score"] == b["_score"]

    def test_pagination_hybrid(self, config):
        full = tensor_search.search(
            config, INDEX, text="my title", search_method="HYBRID",
            limit=NUM_DOCS, hybrid_parameters={
                "retrievalMethod": "disjunction", "rankingMethod": "rrf"})
        paged = []
        for page in range(NUM_DOCS // 20):
            res = tensor_search.search(
                config, INDEX, text="my title", search_method="HYBRID",
                limit=20, offset=page * 20, hybrid_parameters={
                    "retrievalMethod": "disjunction",
                    "rankingMethod": "rrf"})
            paged.extend(res["hits"])
        assert [h["_id"] for h in paged] == \
            [h["_id"] for h in full["hits"][:len(paged)]]

    @pytest.mark.parametrize("method", ["LEXICAL", "TENSOR"])
    def test_negative_offset_rejected(self, config, method):
        for lim in (1, 10):
            for off in (-1, -10, -1000):
                with pytest.raises(
                        api_exceptions.IllegalRequestedDocCount):
                    tensor_search.search(config, INDEX, text=" ",
                                         search_method=method,
                                         limit=lim, offset=off)

    @pytest.mark.parametrize("method", ["LEXICAL", "TENSOR"])
    def test_non_positive_limit_rejected(self, config, method):
        for lim in (0, -1, -1000):
            for off in (1, 10):
                with pytest.raises(
                        api_exceptions.IllegalRequestedDocCount):
                    tensor_search.search(config, INDEX, text=" ",
                                         search_method=method,
                                         limit=lim, offset=off)

    @pytest.mark.parametrize("method", ["LEXICAL", "TENSOR"])
    def test_offset_plus_limit_cap(self, config, method, monkeypatch):
        monkeypatch.setenv("MARQO_MAX_RETRIEVABLE_DOCS", "10000")
        monkeypatch.setenv("MARQO_MAX_SEARCH_LIMIT", "10000")
        with pytest.raises(api_exceptions.IllegalRequestedDocCount):
            tensor_search.search(config, INDEX, text=" ",
                                 search_method=method,
                                 limit=10000, offset=1)
