"""Ported reference tests: text chunk/query prefixes.

Source: /root/reference/tests/tensor_search/test_prefix.py — chunk TEXT is
stored without the prefix while the EMBEDDING includes it; priority
request-level > index override > model default; prefixed search queries.
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

PLAIN = "pfx-plain"
OVERRIDE = "pfx-override"
MODEL_DEFAULT = "pfx-model-default"

DEFAULT_PROPS = {
    "name": "pfx-model", "dimensions": 16, "tokens": 64, "type": "test",
    "text_query_prefix": "test query: ",
    "text_chunk_prefix": "test passage: ",
}


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index(PLAIN))
    cfg.index_management.create_index(IndexSettings(
        model="test", textChunkPrefix="index-override: ",
        textQueryPrefix="query-override: ").to_marqo_index(OVERRIDE))
    cfg.index_management.create_index(IndexSettings(
        model="pfx-model",
        modelProperties=DEFAULT_PROPS).to_marqo_index(MODEL_DEFAULT))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


class TestChunkPrefix:
    def test_prefix_in_vector_not_in_text(self, config):
        """doc_b (request prefix) embeds like doc_c (prefix in text) but
        stores the UNprefixed text; doc_a embeds differently."""
        tensor_search.add_documents(config, AddDocsParams(
            index_name=PLAIN, docs=[{"_id": "doc_a", "text": "hello"}],
            tensor_fields=["text"]))
        tensor_search.add_documents(config, AddDocsParams(
            index_name=PLAIN, docs=[{"_id": "doc_b", "text": "hello"}],
            tensor_fields=["text"], text_chunk_prefix="PREFIX: "))
        tensor_search.add_documents(config, AddDocsParams(
            index_name=PLAIN,
            docs=[{"_id": "doc_c", "text": "PREFIX: hello"}],
            tensor_fields=["text"]))
        res = tensor_search.get_documents_by_ids(
            config, PLAIN, ["doc_a", "doc_b", "doc_c"],
            show_vectors=True)["results"]
        a, b, c = res
        assert a["text"] == "hello"
        assert b["text"] == "hello"
        assert c["text"] == "PREFIX: hello"
        emb = lambda d: d["_tensor_facets"][0]["_embedding"]
        assert np.allclose(emb(b), emb(c))
        assert not np.allclose(emb(a), emb(c))
        # doc_a == direct unprefixed embed
        direct = config.embed.embed_content(PLAIN, content=["hello"],
                                            content_type=None)
        assert np.allclose(emb(a), direct["embeddings"][0])

    def test_prefix_priority(self, config):
        """request-level > index override > model default."""
        override_index = config.index_meta_cache.get_index(OVERRIDE)
        default_index = config.index_meta_cache.get_index(MODEL_DEFAULT)
        assert override_index.model.get_text_chunk_prefix(
            "request-level") == "request-level"
        assert default_index.model.get_text_chunk_prefix(
            "request-level") == "request-level"
        assert override_index.model.get_text_chunk_prefix(None) == \
            "index-override: "
        assert default_index.model.get_text_chunk_prefix(None) == \
            "test passage: "
        assert override_index.model.get_text_query_prefix(None) == \
            "query-override: "
        assert default_index.model.get_text_query_prefix(None) == \
            "test query: "

    def test_index_override_applied_to_docs(self, config):
        tensor_search.add_documents(config, AddDocsParams(
            index_name=OVERRIDE, docs=[{"_id": "doc_a", "text": "hello"}],
            tensor_fields=["text"]))
        res = tensor_search.get_documents_by_ids(
            config, OVERRIDE, ["doc_a"], show_vectors=True)["results"][0]
        direct = config.embed.embed_content(
            OVERRIDE, content=["index-override: hello"], content_type=None)
        assert np.allclose(res["_tensor_facets"][0]["_embedding"],
                           direct["embeddings"][0])

    def test_query_prefix_applied_in_search(self, config):
        """The search query vector equals embedding of prefix+query."""
        tensor_search.add_documents(config, AddDocsParams(
            index_name=OVERRIDE, docs=[{"_id": "1", "text": "anything"}],
            tensor_fields=["text"]))
        captured = {}
        original = config.engine.query_tensor

        def spy(index, vector, *args, **kwargs):
            captured["vector"] = np.asarray(vector, dtype=np.float32)
            return original(index, vector, *args, **kwargs)

        config.engine.query_tensor = spy
        try:
            tensor_search.search(config, OVERRIDE, text="hello")
        finally:
            config.engine.query_tensor = original
        direct = config.embed.embed_content(
            OVERRIDE, content=["query-override: hello"], content_type=None)
        assert np.allclose(captured["vector"], direct["embeddings"][0],
                           atol=1e-6)

    def test_request_level_query_prefix_wins(self, config):
        tensor_search.add_documents(config, AddDocsParams(
            index_name=OVERRIDE, docs=[{"_id": "1", "text": "anything"}],
            tensor_fields=["text"]))
        captured = {}
        original = config.engine.query_tensor

        def spy(index, vector, *args, **kwargs):
            captured["vector"] = np.asarray(vector, dtype=np.float32)
            return original(index, vector, *args, **kwargs)

        config.engine.query_tensor = spy
        try:
            tensor_search.search(config, OVERRIDE, text="hello",
                                 text_query_prefix="REQ: ")
        finally:
            config.engine.query_tensor = original
        direct = config.embed.embed_content(
            OVERRIDE, content=["REQ: hello"], content_type=None)
        assert np.allclose(captured["vector"], direct["embeddings"][0],
                           atol=1e-6)
