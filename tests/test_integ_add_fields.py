"""Ported reference integ tests: semi-structured dynamic field addition.

Source:
/root/reference/tests/tensor_search/integ_tests/
test_add_documents_semi_structured_add_fields.py: new tensor/lexical
fields grow the schema per batch, string/custom-vector/image content
registers lexical fields, multimodal subfields (not the combo itself)
become lexical, the same field name may carry different types across
batches, and per-kind field-count caps raise TooManyFieldsError with the
reference's wording.
"""

import pytest
from PIL import Image

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.add_documents import SemiStructuredFieldCountConfig
from marqo_tpu.core.exceptions import TooManyFieldsError
from marqo_tpu.core.models.add_docs_params import AddDocsParams
from marqo_tpu.inference import vectorise as inference
from marqo_tpu.tensor_search import tensor_search

DIMS = 16  # "test" model dimension
INDEX = "saf-index"

CLIP_PROPS = {
    "type": "clip", "dimensions": 24, "random_init": True, "image_size": 32,
    "architecture": {"patch_size": 8},
}


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


def _add_and_get(cfg, doc_id, tensor_fields, use_existing_tensors=False):
    res = tensor_search.add_documents(cfg, AddDocsParams(
        index_name=INDEX,
        docs=[{"_id": doc_id, "title": "content 1",
               "desc": "content 2. blah blah blah"}],
        tensor_fields=tensor_fields,
        use_existing_tensors=use_existing_tensors))
    assert res["errors"] is False, res
    return tensor_search.get_document_by_id(cfg, INDEX, doc_id,
                                            show_vectors=True)


class TestSemiStructuredAddFields:
    def test_add_documents_should_successfully_add_new_tensor_fields(
            self, config):
        doc1 = _add_and_get(config, "123", ["title"])
        assert len(doc1["_tensor_facets"]) == 1
        assert "title" in doc1["_tensor_facets"][0]

        doc2 = _add_and_get(config, "456", ["desc"])
        assert len(doc2["_tensor_facets"]) == 1
        assert "desc" in doc2["_tensor_facets"][0]

        updated = config.index_management.get_index(INDEX)
        assert set(updated.tensor_field_map.keys()) == {"title", "desc"}

    def test_add_documents_should_override_tensor_fields_for_the_same_doc(
            self, config):
        doc1 = _add_and_get(config, "123", ["title"])
        assert len(doc1["_tensor_facets"]) == 1
        assert "title" in doc1["_tensor_facets"][0]

        doc1 = _add_and_get(config, "123", ["desc"])
        assert len(doc1["_tensor_facets"]) == 1
        assert "desc" in doc1["_tensor_facets"][0]

    def test_add_documents_should_use_existing_tensors_from_the_same_doc(
            self, config, monkeypatch):
        doc1 = _add_and_get(config, "123", ["title"])

        calls = []
        real_vectorise = inference.vectorise

        def spy(*args, **kwargs):
            calls.append(args)
            return real_vectorise(*args, **kwargs)

        monkeypatch.setattr(inference, "vectorise", spy)
        doc2 = _add_and_get(config, "123", ["title"],
                            use_existing_tensors=True)
        assert calls == []
        assert doc1["_tensor_facets"] == doc2["_tensor_facets"]

    def test_add_documents_should_add_string_fields_as_lexical_fields(
            self, config):
        _add_and_get(config, "123", [])

        updated = config.index_management.get_index(INDEX)
        assert "title" in updated.field_map
        assert "desc" in updated.field_map
        assert "title" in updated.lexically_searchable_fields_names
        assert "desc" in updated.lexically_searchable_fields_names
        assert "marqo__lexical_title" in updated.lexical_field_map
        assert "marqo__lexical_desc" in updated.lexical_field_map

        for attr in ("title", "desc"):
            res = tensor_search.search(
                config, INDEX, text="content", search_method="LEXICAL",
                searchable_attributes=[attr])
            assert len(res["hits"]) == 1, attr

    def test_add_documents_should_add_custom_vector_field_content_as_lexical_fields(
            self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX,
            docs=[{"title": "content 1",
                   "custom_vector_field": {"content": "dog",
                                           "vector": [0.2] * DIMS}}],
            tensor_fields=["custom_vector_field"],
            mappings={"custom_vector_field": {"type": "custom_vector"}}))
        assert res["errors"] is False, res
        res = tensor_search.search(
            config, INDEX, text="dog", search_method="LEXICAL",
            searchable_attributes=["custom_vector_field"],
            filter="custom_vector_field:dog")
        assert len(res["hits"]) == 1

        updated = config.index_management.get_index(INDEX)
        assert "custom_vector_field" in updated.field_map
        assert "marqo__lexical_custom_vector_field" in \
            updated.lexical_field_map

    def test_add_documents_should_add_image_field_as_lexical_fields(
            self, config, tmp_path):
        img = tmp_path / "hippo.png"
        Image.new("RGB", (64, 48), color=(90, 90, 90)).save(img)
        inference.clear_loaded_models()
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(IndexSettings(
            model="my-test-clip", modelProperties=CLIP_PROPS,
            treatUrlsAndPointersAsImages=True,
        ).to_marqo_index("saf-image"))
        cfg.index_meta_cache.populate()
        res = tensor_search.add_documents(cfg, AddDocsParams(
            index_name="saf-image",
            docs=[{"title": "content 1", "image_field": str(img)}],
            tensor_fields=["image_field"]))
        assert res["errors"] is False, res

        res = tensor_search.search(
            cfg, "saf-image", text="hippo", search_method="LEXICAL",
            searchable_attributes=["image_field"])
        assert len(res["hits"]) == 1

        updated = cfg.index_management.get_index("saf-image")
        assert "image_field" in updated.field_map
        assert "marqo__lexical_image_field" in updated.lexical_field_map
        inference.clear_loaded_models()

    def test_add_documents_should_add_multimodal_subfield_as_lexical_fields(
            self, config):
        res = tensor_search.add_documents(config, AddDocsParams(
            index_name=INDEX, docs=[{"title": "content 1"}],
            tensor_fields=["combo_field"],
            mappings={"combo_field": {"type": "multimodal_combination",
                                      "weights": {"title": 1.0}}}))
        assert res["errors"] is False, res

        res = tensor_search.search(
            config, INDEX, text="content", search_method="LEXICAL",
            searchable_attributes=["title"])
        assert len(res["hits"]) == 1

        res = tensor_search.search(
            config, INDEX, text="content", search_method="TENSOR",
            searchable_attributes=["combo_field"])
        assert len(res["hits"]) == 1

        updated = config.index_management.get_index(INDEX)
        assert "title" in updated.field_map
        assert "marqo__lexical_title" in updated.lexical_field_map
        assert "combo_field" not in updated.field_map
        assert "marqo__lexical_combo_field" not in updated.lexical_field_map

    def test_add_documents_should_allow_the_same_field_to_have_different_types_in_different_batches(
            self, config):
        config.document.add_documents(AddDocsParams(
            index_name=INDEX, docs=[{"_id": "1", "title": "content 1"}],
            tensor_fields=["universal_tensor_field"],
            mappings={"universal_tensor_field": {
                "type": "multimodal_combination",
                "weights": {"title": 1.0}}}))
        config.document.add_documents(AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "2", "title": "content 1",
                   "universal_tensor_field": {"content": "content",
                                              "vector": [0.2] * DIMS}}],
            tensor_fields=["universal_tensor_field"],
            mappings={"universal_tensor_field": {"type": "custom_vector"}}))
        config.document.add_documents(AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "3", "universal_tensor_field": "content 1"}],
            tensor_fields=["universal_tensor_field"]))
        config.document.add_documents(AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "4", "title": "content 1",
                   "universal_tensor_field": 1.0}],
            tensor_fields=["title"]))

        res = tensor_search.search(
            config, INDEX, text="content", search_method="TENSOR",
            searchable_attributes=["universal_tensor_field"])
        assert {h["_id"] for h in res["hits"]} == {"1", "2", "3"}

        res = tensor_search.search(
            config, INDEX, text="content", search_method="LEXICAL",
            searchable_attributes=["universal_tensor_field"])
        # doc 1's combo field has no own lexical content — only 2 and 3
        assert {h["_id"] for h in res["hits"]} == {"2", "3"}

    def test_add_documents_should_raise_error_when_field_count_exceeds_limit(
            self, config):
        fcc = SemiStructuredFieldCountConfig(max_lexical_field_count=6,
                                             max_tensor_field_count=5)
        config.document.add_documents(AddDocsParams(
            index_name=INDEX,
            docs=[{"_id": "1", **{f"tensor_field{i}": f"content {i}"
                                  for i in range(1, 6)}}],
            tensor_fields=[f"tensor_field{i}" for i in range(1, 6)]),
            field_count_config=fcc)

        with pytest.raises(TooManyFieldsError) as err:
            config.document.add_documents(AddDocsParams(
                index_name=INDEX,
                docs=[{"_id": "2", "tensor_field6": "content 6"}],
                tensor_fields=["tensor_field6"]), field_count_config=fcc)
        assert ("has 5 tensor fields. Your request to add tensor_field6 "
                "as a tensor field is rejected since it exceeds the limit "
                "of 5. Please set a larger limit in "
                "MARQO_MAX_TENSOR_FIELD_COUNT_UNSTRUCTURED environment "
                "variable.") in str(err.value)

        with pytest.raises(TooManyFieldsError) as err2:
            config.document.add_documents(AddDocsParams(
                index_name=INDEX,
                docs=[{"_id": "3", "tensor_field1": "content 1",
                       "lexical_field6": "content 6",
                       "lexical_field7": "content 7"}],
                tensor_fields=["tensor_field1"]), field_count_config=fcc)
        assert ("has 6 lexical fields. Your request to add lexical_field7 "
                "as a lexical field is rejected since it exceeds the limit "
                "of 6. Please set a larger limit in "
                "MARQO_MAX_LEXICAL_FIELD_COUNT_UNSTRUCTURED environment "
                "variable.") in str(err2.value)
