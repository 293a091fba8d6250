"""Ported reference tests: mappings-object validation.

Source: /root/reference/tests/tensor_search/test_validation.py
(test_validate_mappings / test_validate_mappings_invalid /
test_*_mappings_object) — multimodal mappings require exactly
{type, weights} with numeric weights; custom_vector mappings carry only
{type}; unknown types, missing types, empty mappings all rejected.
"""

import pydantic
import pytest

from marqo_tpu.core.models.add_docs_params import AddDocsParams


def _params(mappings):
    return AddDocsParams(index_name="x", docs=[{"a": "b"}],
                         tensor_fields=[], mappings=mappings)


VALID = [
    {"my_combination_field": {"type": "multimodal_combination",
                              "weights": {"some_text": 0.5}}},
    {"a": {"type": "multimodal_combination",
           "weights": {"some_text": 0.5}},
     "b": {"type": "multimodal_combination",
           "weights": {"some_text": 0.7, "bugs": 200}}},
    {},
    {"neg": {"type": "multimodal_combination",
             "weights": {"some_text": -2}}},
    {"zero": {"type": "multimodal_combination",
              "weights": {"some_text": 0}}},
    {"my_custom_vector": {"type": "custom_vector"}},
    {"my_custom_vector": {"type": "custom_vector"},
     "combo": {"type": "multimodal_combination",
               "weights": {"some_text": -4.6, "other_text": 22}}},
]

INVALID = [
    {"f": {"type": "othertype", "weights": {"some_text": 0.5}}},
    {"f": {"weights": {"some_text": 0.5}}},          # no type
    {"f": {}},                                        # empty mapping
    {"f": {"type": "multimodal_combination",
           "non_weights": {"some_text": 0.5}}},       # unknown key
    {"f": {"type": "multimodal_combination"}},        # missing weights
    {"f": {"type": "multimodal_combination",
           "weights": {"blah": "woo"}}},              # non-number weight
    {"f": {"type": "multimodal_combination",
           "weights": {"blah": "1.3"}}},              # stringly number
    {"f": {"type": "multimodal_combination",
           "weights": {"some_text": -4.6},
           "extra_field": "blah"}},                   # extra key
    {"f": {"type": "multimodal_combination",
           "weights": {"nontext": True}}},            # bool weight
    {"f": {"type": "custom_vector", "extra": 1}},     # cv extra key
]


class TestMappingsValidation:
    @pytest.mark.parametrize("mappings", VALID)
    def test_valid_mappings_accepted(self, mappings):
        _params(mappings)  # must not raise

    @pytest.mark.parametrize("mappings", INVALID)
    def test_invalid_mappings_rejected(self, mappings):
        with pytest.raises(pydantic.ValidationError):
            _params(mappings)
