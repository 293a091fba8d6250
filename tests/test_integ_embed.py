"""Ported reference integ tests: embed endpoint equivalences.

Source: /root/reference/tests/tensor_search/integ_tests/test_embed.py —
embed must produce bit-identical vectors to the add-documents chunk
pipeline and to the search query pipeline (same model path, prefixes,
weighted-dict merging), plus its validation errors.
"""

import numpy as np
import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    cfg.index_management.create_index(
        IndexSettings(model="test").to_marqo_index("embed-index"))
    cfg.index_management.create_index(
        IndexSettings(model="test",
                      textQueryPrefix="test query: ",
                      textChunkPrefix="test passage: ",
                      ).to_marqo_index("embed-prefix-index"))
    cfg.index_meta_cache.populate()
    yield cfg
    inference.clear_loaded_models()


def _captured_query_vector(cfg, index_name, text):
    """Run a real tensor search and capture the engine-bound query vector
    (the reference mocks VespaClient.query for the same purpose)."""
    captured = {}
    original = cfg.engine.query_tensor

    def spy(index, vector, *args, **kwargs):
        captured["vector"] = np.asarray(vector, dtype=np.float32)
        return original(index, vector, *args, **kwargs)

    cfg.engine.query_tensor = spy
    try:
        tensor_search.search(cfg, index_name, text=text,
                             search_method="TENSOR")
    finally:
        cfg.engine.query_tensor = original
    return captured["vector"]


class TestEmbedEquivalences:
    def test_embed_equivalent_to_add_docs(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="embed-index",
            docs=[{"_id": "0", "text_field_1": "I am the GOAT."}],
            tensor_fields=["text_field_1"]))
        assert res["errors"] is False
        get_res = tensor_search.get_document_by_id(
            config, "embed-index", "0", show_vectors=True)
        assert get_res["_id"] == "0"
        assert len(get_res["_tensor_facets"]) == 1
        doc_embedding = get_res["_tensor_facets"][0]["_embedding"]

        embed_res = config.embed.embed_content(
            "embed-index", content=["I am the GOAT."])
        assert embed_res["content"] == ["I am the GOAT."]
        assert np.allclose(embed_res["embeddings"][0], doc_embedding,
                           atol=1e-6)

    def test_embed_equivalent_to_search_text(self, config):
        search_vec = _captured_query_vector(config, "embed-index",
                                            "I am the GOAT.")
        embed_res = config.embed.embed_content(
            "embed-index", content=["I am the GOAT."])
        assert np.allclose(embed_res["embeddings"][0], search_vec,
                           atol=1e-6)

    def test_embed_equivalent_to_search_weighted_dict(self, config):
        query = {"I am the GOATest of all time.": 0.7, "hello world": 0.3}
        search_vec = _captured_query_vector(config, "embed-index", query)
        embed_res = config.embed.embed_content("embed-index",
                                               content=[query])
        assert embed_res["content"] == [query]
        assert np.allclose(embed_res["embeddings"][0], search_vec,
                           atol=1e-6)

    def test_embed_equivalent_to_search_multiple_content(self, config):
        items = ["GOAT #1", "GOAT #2",
                 {"The inner GOAT.": 0.65, "other": 0.42}]
        search_vecs = [_captured_query_vector(config, "embed-index", item)
                       for item in items]
        embed_res = config.embed.embed_content("embed-index", content=items)
        assert embed_res["content"] == items
        for i in range(len(items)):
            assert np.allclose(embed_res["embeddings"][i], search_vecs[i],
                               atol=1e-6)

    def test_embed_prefix_content_type(self, config):
        """content_type='query'/'document' applies the index's prefixes;
        hardcoding the prefix with content_type=None is identical
        (reference test_embed_prefix_content_type)."""
        hardcoded = config.embed.embed_content(
            "embed-prefix-index", content=["test query: I am the GOAT."],
            content_type=None)
        prefixed = config.embed.embed_content(
            "embed-prefix-index", content=["I am the GOAT."],
            content_type="query")
        assert hardcoded["content"] == ["test query: I am the GOAT."]
        assert np.allclose(hardcoded["embeddings"][0],
                           prefixed["embeddings"][0], atol=1e-6)

        hardcoded = config.embed.embed_content(
            "embed-prefix-index", content=["test passage: I am the GOAT."],
            content_type=None)
        prefixed = config.embed.embed_content(
            "embed-prefix-index", content=["I am the GOAT."],
            content_type="document")
        assert hardcoded["content"] == ["test passage: I am the GOAT."]
        assert np.allclose(hardcoded["embeddings"][0],
                           prefixed["embeddings"][0], atol=1e-6)

    def test_embed_equivalent_to_add_docs_with_prefix(self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name="embed-index",
            docs=[{"_id": "0", "text_field_1": "I am the GOAT."}],
            tensor_fields=["text_field_1"],
            text_chunk_prefix="PREFIX: "))
        assert res["errors"] is False
        get_res = tensor_search.get_document_by_id(
            config, "embed-index", "0", show_vectors=True)
        doc_embedding = get_res["_tensor_facets"][0]["_embedding"]
        embed_res = config.embed.embed_content(
            "embed-index", content=["PREFIX: I am the GOAT."],
            content_type=None)
        assert np.allclose(embed_res["embeddings"][0], doc_embedding,
                           atol=1e-6)


class TestEmbedValidation:
    def test_embed_empty_content_list_fails(self, config):
        with pytest.raises(Exception) as e:
            config.embed.embed_content("embed-index", content=[])
        assert "empty" in str(e.value).lower()

    def test_embed_invalid_content_type_fails(self, config):
        # dict with non-numeric weight → 400-class error, not a crash
        for content in ({"key": "not a number"}, [{"key": "value"}]):
            with pytest.raises(InvalidArgumentError):
                config.embed.embed_content("embed-index", content=content)

    def test_embed_invalid_content_type_string(self, config):
        with pytest.raises(InvalidArgumentError):
            config.embed.embed_content("embed-index", content=["x"],
                                       content_type="bogus")

    def test_embed_non_string_non_dict_item(self, config):
        with pytest.raises(InvalidArgumentError):
            config.embed.embed_content("embed-index", content=[42])


class TestEmbedQueryPipelineParity:
    """Embed must be the SAME pipeline as query vectorisation (reference
    embed.py:85-109 → run_vectorise_pipeline): weighted parts mean-merge
    even without normalization, and media-pointer keys embed as media."""

    def test_weighted_dict_matches_search_without_normalization(self):
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="test", normalizeEmbeddings=False)
            .to_marqo_index("embed-nonorm"))
        cfg.index_meta_cache.populate()
        query = {"alpha beta": 0.7, "gamma delta": 0.3}
        search_vec = _captured_query_vector(cfg, "embed-nonorm", query)
        embed_res = cfg.embed.embed_content("embed-nonorm", content=[query])
        # sum-merge instead of mean-merge diverges exactly here: identical
        # direction, 2x the magnitude
        assert np.allclose(embed_res["embeddings"][0], search_vec, atol=1e-6)

    def test_image_pointer_in_weighted_dict_embeds_as_image(self, tmp_path):
        from PIL import Image
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        clip_props = {"type": "clip", "dimensions": 24, "random_init": True,
                      "image_size": 32, "architecture": {"patch_size": 8}}
        cfg.index_management.create_index(
            IndexSettings(model="my-test-clip", modelProperties=clip_props,
                          treatUrlsAndPointersAsImages=True)
            .to_marqo_index("embed-img"))
        cfg.index_meta_cache.populate()
        path = tmp_path / "red.png"
        Image.new("RGB", (32, 32), color=(230, 20, 20)).save(path)
        pointer = str(path)
        # weighted dict with ONLY the image pointer == plain image embed
        solo = cfg.embed.embed_content("embed-img", content=[pointer])
        weighted = cfg.embed.embed_content("embed-img",
                                           content=[{pointer: 1.0}])
        assert np.allclose(weighted["embeddings"][0], solo["embeddings"][0],
                           atol=1e-6)
        # and both differ from a true text embedding
        text_vec = cfg.embed.embed_content("embed-img",
                                           content=["not a pointer at all"])
        assert not np.allclose(weighted["embeddings"][0],
                               text_vec["embeddings"][0], atol=1e-3)
        inference.clear_loaded_models()
