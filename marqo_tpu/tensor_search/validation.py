"""Centralized request-validation surface.

Parity: reference src/marqo/tensor_search/validation.py (the 669-LoC edge
-case module) + tensor_search/constants.py:5-13 + enums.py:13-27
(TensorField protected names). Every function mirrors the reference's
contract — same accepted shapes, same exception classes, same message
fragments its test-suite asserts on — so a user switching from the
reference finds the identical validation API.

The repo's ingest/index paths keep their own specialised checks (doc ids
in utils.validate_doc_id, index-schema field names in
core/models/marqo_index.py — a different rule set from document field
names); this module is the reference-parity surface for the functions the
reference's validation API exposes.
"""

import json
from enum import Enum
from typing import Any, Dict, List, Optional, Sequence, Type, Union

import jsonschema

from marqo_tpu.api.exceptions import (DocTooLargeError, InvalidArgError,
                                      InvalidDocumentIdError,
                                      InvalidFieldNameError)
from marqo_tpu.api import configs


class SearchMethod(str, Enum):
    """Reference enums.py SearchMethod."""
    TENSOR = "TENSOR"
    LEXICAL = "LEXICAL"
    HYBRID = "HYBRID"


class TensorField:
    """Protected document field names (reference enums.py:13-27)."""
    field_name = "__field_name"
    field_content = "__field_content"
    vector_prefix = "__vector_"
    marqo_knn_field = "__vector_marqo_knn_field"
    chunks = "__chunks"
    output_highlights = "_highlights"
    output_score = "_score"
    tensor_facets = "_tensor_facets"
    embedding = "_embedding"
    found = "_found"


class MappingsObjectType(str, Enum):
    multimodal_combination = "multimodal_combination"
    custom_vector = "custom_vector"


# reference constants.py:5-13
ILLEGAL_CUSTOMER_FIELD_NAME_CHARS = {".", "/", "\n"}
ALLOWED_UNSTRUCTURED_FIELD_TYPES = [str, int, float, bool, list, dict]
ALLOWED_MULTIMODAL_FIELD_TYPES = [str]
ALLOWED_CUSTOM_VECTOR_CONTENT_TYPES = [str]

# reference models/mappings_object.py — the three schemas are the wire
# contract for the `mappings` request parameter
MAPPINGS_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "object",
    "patternProperties": {
        "^.*$": {
            "type": "object",
            "properties": {
                "type": {
                    "type": "string",
                    "enum": [t.value for t in MappingsObjectType],
                },
            },
            "required": ["type"],
        }
    },
}

MULTIMODAL_COMBINATION_MAPPINGS_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "object",
    "properties": {
        "type": {
            "type": "string",
            "enum": [MappingsObjectType.multimodal_combination.value],
        },
        "weights": {
            "type": "object",
            "patternProperties": {"^.*$": {"type": "number"}},
        },
    },
    "required": ["type", "weights"],
    "additionalProperties": False,
}

CUSTOM_VECTOR_MAPPINGS_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "object",
    "properties": {
        "type": {
            "type": "string",
            "enum": [MappingsObjectType.custom_vector.value],
        }
    },
    "required": ["type"],
    "additionalProperties": False,
}


def validate_query(q, search_method) -> Optional[Union[dict, str]]:
    """Reference validation.py:24-72: strings and None always pass; dict
    (weighted multi-query) only for TENSOR; CustomVectorQuery only for
    HYBRID/TENSOR; anything else is a 400."""
    from marqo_tpu.api.models.requests import CustomVectorQuery

    if isinstance(q, str) or q is None:
        return q
    if isinstance(q, CustomVectorQuery):
        method = str(search_method).upper()
        if method not in (SearchMethod.HYBRID.value,
                          SearchMethod.TENSOR.value):
            raise InvalidArgError(
                'Custom vector search is currently only supported for '
                f'search_method="HYBRID" \nReceived search_method '
                f'`{search_method}`.')
        return q
    if isinstance(q, dict):
        if str(search_method).upper() != SearchMethod.TENSOR.value:
            raise InvalidArgError(
                'Multi-query search is currently only supported for '
                f'search_method="TENSOR" \nReceived search_method '
                f'`{search_method}`.')
        if not len(q):
            raise InvalidArgError(
                "Multi-query search requires at least one query! "
                "Received empty dictionary.")
        for k, v in q.items():
            base = "Multi queries dictionaries must be <string>:<float> pairs. "
            if not isinstance(k, str):
                raise InvalidArgError(
                    f"{base}Found key of type `{type(k)}` instead of "
                    f"string. Key=`{k}`")
            if not isinstance(v, (int, float)):
                raise InvalidArgError(
                    f"{base}Found value of type `{type(v)}` instead of "
                    f"float. Value=`{v}`")
        return q
    raise InvalidArgError(
        f"'q' must be a 'string', a 'dict', or 'None' (if 'context' is "
        f"provided)! Received q of type `{type(q)}`.\nq=`{q}`")


def validate_searchable_attributes(searchable_attributes: Optional[List[str]],
                                   search_method) -> None:
    """Reference validation.py:74-97: the MARQO_MAX_SEARCHABLE_TENSOR_
    ATTRIBUTES cap applies to TENSOR search only; once set, the request
    must pass explicit searchable_attributes."""
    if search_method != SearchMethod.TENSOR:
        return
    max_attrs = configs.read_env_vars_and_defaults(
        "MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES")
    if max_attrs is None:
        return
    if searchable_attributes is None:
        raise InvalidArgError(
            "No searchable_attributes provided, but environment variable "
            "`MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES` is set.")
    if len(searchable_attributes) > int(max_attrs):
        raise InvalidArgError(
            f"Maximum searchable attributes (set via "
            f"`MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES`) for tensor search "
            f"is {max_attrs}, received {len(searchable_attributes)}.")


def validate_str_against_enum(value: Any, enum_class: Type[Enum],
                              case_sensitive: bool = True):
    """Reference validation.py:99-116."""
    if case_sensitive:
        enum_values = set(item.value for item in enum_class)
        to_test = value
    else:
        enum_values = set(item.value.upper() for item in enum_class)
        to_test = value.upper()
    if to_test not in enum_values:
        raise ValueError(f"{value} is not a valid {enum_class.__name__}")
    return value


def list_types_valid(field_content: List) -> bool:
    """Reference validation.py:118-134: homogeneous int/float/str lists."""
    if len(field_content) == 0:
        return True
    list_type = type(field_content[0])
    if list_type not in [int, float, str]:
        return False
    return all(type(element) is list_type for element in field_content)


def validate_list(field_content: List, is_non_tensor_field: bool) -> bool:
    """Reference validation.py:136-151: lists must be homogeneous and can
    never be tensor fields."""
    if type(field_content) is list and not list_types_valid(field_content):
        raise InvalidArgError(
            f"Field content '{field_content}' of type "
            f"{type(field_content).__name__} is not of valid content type! "
            f"All list elements must be of the same type and that type "
            f"must be int, float or string")
    if not is_non_tensor_field:
        raise InvalidArgError(
            f"Field content '{field_content}' of type "
            f"{type(field_content).__name__} is not of valid content."
            f"Lists cannot be tensor fields")
    return True


def validate_field_content(field_content: Any,
                           is_non_tensor_field: bool) -> Any:
    """Reference validation.py:153-171."""
    if type(field_content) in ALLOWED_UNSTRUCTURED_FIELD_TYPES:
        if isinstance(field_content, list):
            validate_list(field_content, is_non_tensor_field)
        return field_content
    raise InvalidArgError(
        f"Field content `{field_content}` \nof type "
        f"`{type(field_content).__name__}` is not of valid content type!"
        f"Allowed content types: "
        f"{[ty.__name__ for ty in ALLOWED_UNSTRUCTURED_FIELD_TYPES]}")


def validate_context(context, search_method, query) -> None:
    """Reference validation.py:174-189: context + plain-string query is
    invalid for TENSOR search (context needs a dict query)."""
    if context is not None and search_method == SearchMethod.TENSOR and \
            isinstance(query, str):
        raise InvalidArgError(
            f"Marqo received a query = `{query}` with type "
            f"=`{type(query).__name__}` and a parameter `context`.\n"
            f"This is not supported as the context only works when the "
            f"query is a dictionary. If you aim to search with your custom "
            f"vectors, reformat the query as a dictionary.")


def validate_boost(boost: Optional[Dict], search_method) -> Optional[Dict]:
    """Reference validation.py:192-239: TENSOR-only; attribute names must
    be valid field names; values are [weight] or [weight, bias] numbers."""
    if boost is None:
        return None
    for boost_attr in boost:
        try:
            validate_field_name(boost_attr)
        except InvalidFieldNameError as e:
            raise InvalidFieldNameError(
                f"Invalid boost dictionary. {e.message}")
    if search_method != SearchMethod.TENSOR:
        raise InvalidArgError(
            f'Boosting is only supported for search_method="TENSOR". '
            f'Received search_method={search_method}')
    if not isinstance(boost, dict):
        raise InvalidArgError(
            f"Boost must be a dictionary. Instead received boost of value "
            f"`{boost}`")
    for k, v in boost.items():
        base = ("Boost dictionaries have structure <attribute (string)>: "
                "<[weight (float), bias (float)]>\n")
        if not isinstance(k, str):
            raise InvalidArgError(
                f"{base}Found key of type `{type(k)}` instead of string. "
                f"Key=`{k}`")
        if not isinstance(v, Sequence):
            raise InvalidArgError(
                f"{base}Found value of type `{type(v)}` instead of Array. "
                f"Value=`{v}`")
        if len(v) not in [1, 2]:
            raise InvalidArgError(
                f"{base}An attribute boost must have a weight float and "
                f"optional bias float. Instead received invalid boost "
                f"`{v}`")
        for wb in v:
            if not isinstance(wb, (int, float)) or isinstance(wb, bool):
                raise InvalidArgError(
                    f"{base}An attribute boost must have a weight float "
                    f"and optional bias float. Instead received boost "
                    f"`{v}` with invalid member `{wb}` of type {type(wb)}")
    return boost


def validate_field_name(field_name) -> str:
    """Reference validation.py:242-275: non-empty strings without illegal
    chars ('.', '/', newline) that don't collide with the protected
    TensorField names/prefix."""
    if not field_name:
        raise InvalidFieldNameError("field name can't be empty! ")
    if not isinstance(field_name, str):
        raise InvalidFieldNameError("field name must be str!")
    if field_name.startswith(TensorField.vector_prefix):
        raise InvalidFieldNameError(
            f"can't start field name with protected prefix "
            f"{TensorField.vector_prefix}. Error raised for field name: "
            f"{field_name}")
    if field_name.startswith(TensorField.chunks):
        raise InvalidFieldNameError(
            f"can't name field with protected field name "
            f"{TensorField.chunks}. Error raised for field name: "
            f"{field_name}")
    for c in field_name:
        if c in ILLEGAL_CUSTOMER_FIELD_NAME_CHARS:
            raise InvalidFieldNameError(
                f"Illegal character '{c}' detected in field name "
                f"{field_name}")
    if field_name in vars(TensorField).values():
        raise InvalidFieldNameError(
            f"field name can't be a protected field. Please rename this "
            f"field: {field_name}")
    return field_name


# reference validation.py:278-313 duplicates the structured-index rules for
# unstructured indexes verbatim
validate_unstructured_index_field_name = validate_field_name


def validate_doc(doc: Dict) -> dict:
    """Reference validation.py:315-344: non-empty dict under the
    MARQO_MAX_DOC_BYTES serialized-size cap."""
    if not isinstance(doc, dict):
        raise InvalidArgError("Docs must be dicts")
    if len(doc) <= 0:
        raise InvalidArgError("Can't index an empty dict.")
    max_doc_size = configs.read_env_vars_and_defaults("MARQO_MAX_DOC_BYTES")
    if max_doc_size is not None:
        try:
            serialized = json.dumps(doc)
        except TypeError:
            raise InvalidArgError(
                f"Unable to index document: it is not serializable! "
                f"Document: `{doc}` ")
        if len(serialized) > int(max_doc_size):
            maybe_id = f" _id:`{doc['_id']}`" if "_id" in doc else ""
            raise DocTooLargeError(
                f"Document{maybe_id} with length `{len(serialized)}` "
                f"exceeds the allowed document size limit of "
                f"[{max_doc_size}].")
    return doc


def validate_id(_id: str) -> str:
    """Reference validation.py:347-362."""
    if not isinstance(_id, str):
        raise InvalidDocumentIdError(
            "Document _id must be a string type! "
            f"Received _id {_id} of type `{type(_id).__name__}`")
    if not _id:
        raise InvalidDocumentIdError("Document ID can't be empty")
    return _id


def validate_dict(field: str, field_content: Dict, is_non_tensor_field: bool,
                  mappings: Dict, index_model_dimensions: int = None,
                  structured_field_type=None,
                  marqo_index_version: str = "2.13.0"):
    """Reference validation.py:365-420: dispatch a dict field's validation
    by its mappings entry (multimodal_combination / custom_vector), its
    structured field type, or — with no mapping — treat it as a numeric
    map field (2.9.0+ indexes only)."""
    from marqo_tpu.core.models.marqo_index import FieldType

    def _version_tuple(v) -> tuple:
        return tuple(int(p) for p in str(v).split("-")[0].split("+")[0]
                     .split(".")[:3])

    if mappings and field in mappings:
        mapping_type = mappings[field]["type"]
        if mapping_type == MappingsObjectType.multimodal_combination:
            return validate_multimodal_combination(
                field_content, is_non_tensor_field, mappings[field])
        if mapping_type == MappingsObjectType.custom_vector:
            return validate_custom_vector(field_content, is_non_tensor_field,
                                          index_model_dimensions)
        raise InvalidArgError(
            f"The field `{field}` is of invalid type in the `mappings` "
            f"parameter. The only object field type supported is "
            f"`custom_vector`. However, the `mappings` provided is: "
            f"{mappings}. Please change the type of {field}. ")
    if structured_field_type:
        if structured_field_type == FieldType.MultimodalCombination:
            return validate_multimodal_combination(
                field_content, is_non_tensor_field, mappings[field])
        if structured_field_type == FieldType.CustomVector:
            return validate_custom_vector(field_content, is_non_tensor_field,
                                          index_model_dimensions)
        if structured_field_type in (FieldType.MapFloat, FieldType.MapInt,
                                     FieldType.MapDouble, FieldType.MapLong):
            return validate_map_numeric_field(field_content)
        raise InvalidArgError(
            f"The field {field} is of type `{structured_field_type}`, "
            f"which is not a valid object field type. The only object "
            f"field type supported is `custom_vector`. Please change the "
            f"type of {field} to use it as an object field. ")
    if _version_tuple(marqo_index_version) < (2, 9, 0):
        raise InvalidArgError(
            f"The field {field} is a map field and only supported for "
            f"indexes created with Marqo 2.9.0 or later. ")
    return validate_map_numeric_field(field_content)


def validate_map_numeric_field(field_content):
    """Reference validation.py:423-458: one-level {str: number} maps."""
    if not isinstance(field_content, dict):
        raise InvalidArgError(
            f"The field content '{field_content}' is of type "
            f"'{type(field_content).__name__}', which is not a valid type "
            f"for a map field. A map field must be a dictionary.")
    if any(isinstance(v, dict) for v in field_content.values()):
        raise InvalidArgError(
            "Nested dictionaries are not allowed in map fields. Each value "
            "must be a single int, float, or double.")
    for key, value in field_content.items():
        if not isinstance(key, str):
            raise InvalidArgError(
                f"Key '{key}' in map field is not a string. All keys must "
                f"be strings.")
        if not isinstance(value, (int, float)) or isinstance(value, bool):
            raise InvalidArgError(
                f"Value '{value}' for key '{key}' in map field is not of "
                f"type int or float. If you are using an unstructured "
                f"index and attempting to index another type of object "
                f"field (e.g. custom_vector field), please use the "
                f"'mappings' object. ")
    return field_content


def validate_multimodal_combination(field_content, is_non_tensor_field,
                                    field_mapping):
    """Reference validation.py:461-501: non-empty {str: str} content, every
    sub-field weighted in the mapping, and the field must be a tensor
    field."""
    if len(field_content) < 1:
        raise InvalidArgError(
            f"The multimodal_combination field `{field_content}` is an "
            f"empty dictionary. This is not a valid format of field "
            f"content. If you aim to use multimodal_combination, it must "
            f"contain at least 1 field. ")
    for key, value in field_content.items():
        if not ((type(key) in ALLOWED_MULTIMODAL_FIELD_TYPES) and
                (type(value) in ALLOWED_MULTIMODAL_FIELD_TYPES)):
            raise InvalidArgError(
                f"Multimodal-combination field content `{key}:{value}` \n  "
                f"of type `{type(key).__name__} : {type(value).__name__}` "
                f"is not of valid content type (one of "
                f"{ALLOWED_MULTIMODAL_FIELD_TYPES}).")
        if key not in field_mapping["weights"]:
            raise InvalidArgError(
                f"Multimodal-combination field content `{key}:{value}` \n  "
                f"is not in the multimodal_field mappings weights "
                f"`{field_mapping['weights']}`. Each sub_field requires a "
                f"weight. Please add `{key}` to the mappings.")
    if is_non_tensor_field:
        raise InvalidArgError(
            f"Field content `{field_content}` \n  of type "
            f"`{type(field_content).__name__}` is the content for a "
            f"multimodal_combination. It must be a tensor field. Add this "
            f"field to `tensorFields` or add it as a normal field to fix "
            f"this problem.")
    return field_content


def validate_custom_vector(field_content: dict, is_non_tensor_field: bool,
                           index_model_dimensions: int):
    """Reference validation.py:504-521 + models/custom_vector_object.py:
    {"vector": [numbers] (required, model-dimension length),
    "content": str (optional, defaults "")}; must be a tensor field.
    Returns the content dict with "content" defaulted in."""
    if not isinstance(index_model_dimensions, int) or \
            isinstance(index_model_dimensions, bool):
        if index_model_dimensions is None:
            raise InvalidArgError(
                "invalid index_model_dimensions: none is not an allowed "
                "value")
        raise InvalidArgError(
            f"invalid index_model_dimensions `{index_model_dimensions}`: "
            f"value is not a valid integer")
    if is_non_tensor_field:
        raise InvalidArgError(
            f"Cannot create custom_vector field (given field content: "
            f"'{field_content}') as a non-tensor field. Add this field to "
            f"'tensor_fields' to fix this problem.")
    extra_fields = field_content.keys() - {"vector", "content"}
    if extra_fields:
        raise InvalidArgError(
            f"Custom vector field can only contain fields 'vector' and "
            f"'content'. Received unexpected extra fields: {extra_fields}.")
    if "vector" not in field_content:
        raise InvalidArgError(
            f"Cannot create custom_vector field missing 'vector', which is "
            f"a required key. Given field content: '{field_content}'")
    vector = field_content["vector"]
    if not isinstance(vector, List):
        raise InvalidArgError(
            f"Custom vector field 'vector' must be a list, but given "
            f"vector is of type {type(vector)}")
    for element in vector:
        if not isinstance(element, (int, float)) or isinstance(element, bool):
            raise InvalidArgError(
                f"Custom vector field 'vector' must be a list of numbers, "
                f"but given vector contains an element of type "
                f"{type(element)}")
    if index_model_dimensions and len(vector) != index_model_dimensions:
        raise InvalidArgError(
            f"Custom vector must have dimension of "
            f"{index_model_dimensions}, but given vector is of length "
            f"{len(vector)}")
    validated = dict(field_content)
    if "content" in validated:
        if not any(isinstance(validated["content"], t)
                   for t in ALLOWED_CUSTOM_VECTOR_CONTENT_TYPES):
            raise InvalidArgError(
                f"Custom vector field 'content' must be one of the "
                f"following types: {ALLOWED_CUSTOM_VECTOR_CONTENT_TYPES}, "
                f"but given content is of type "
                f"{type(validated['content'])}")
    else:
        validated["content"] = ""
    return validated


def validate_mappings_object(mappings_object: Dict,
                             structured_marqo_index=None):
    """Reference validation.py:524-572: jsonschema envelope + per-field
    dispatch; with a structured index, multimodal mappings must target an
    existing multimodal field and only its dependent fields."""
    from marqo_tpu.core.models.marqo_index import FieldType
    try:
        jsonschema.validate(instance=mappings_object, schema=MAPPINGS_SCHEMA)
        for field_name, config in mappings_object.items():
            validate_field_name(field_name)
            if config["type"] == MappingsObjectType.multimodal_combination:
                validate_multimodal_combination_mappings_object(config)
                if structured_marqo_index is not None:
                    field_map = structured_marqo_index.field_map
                    if (field_name not in field_map or
                            field_map[field_name].type !=
                            FieldType.MultimodalCombination):
                        raise jsonschema.ValidationError(
                            f"Invalid mapping {field_name}. Index has no "
                            f"multimodal combination field {field_name}")
                    dependent = field_map[field_name].dependent_fields or {}
                    for child in config["weights"]:
                        if child not in dependent:
                            raise jsonschema.ValidationError(
                                f"Invalid mapping {field_name}. Field "
                                f"{child} is not a dependent field of "
                                f"{field_name}")
            elif config["type"] == MappingsObjectType.custom_vector:
                validate_custom_vector_mappings_object(config)
        return mappings_object
    except jsonschema.ValidationError as e:
        raise InvalidArgError(
            f"Error validating mappings object. Reason: {str(e)}. ")


def validate_multimodal_combination_mappings_object(mappings_object: Dict):
    """Reference validation.py:575-611."""
    try:
        jsonschema.validate(instance=mappings_object,
                            schema=MULTIMODAL_COMBINATION_MAPPINGS_SCHEMA)
    except jsonschema.ValidationError as e:
        raise InvalidArgError(
            f"Error validating multimodal combination mappings object. "
            f"Reason: \n{str(e)}")
    for child_field, weight in mappings_object["weights"].items():
        if type(child_field) not in ALLOWED_MULTIMODAL_FIELD_TYPES:
            raise InvalidArgError(
                f"The multimodal_combination mapping `{mappings_object}` "
                f"has an invalid child_field `{child_field}` of type "
                f"`{type(child_field).__name__}`. In "
                f"multimodal_combination fields, it must be a string.")
        if not isinstance(weight, (float, int)) or isinstance(weight, bool):
            raise InvalidArgError(
                f"The multimodal_combination mapping `{mappings_object}` "
                f"has an invalid weight `{weight}` of type "
                f"`{type(weight).__name__}`. In multimodal_combination "
                f"fields, weight must be an int or float.")
    return mappings_object


def validate_custom_vector_mappings_object(mappings_object: Dict):
    """Reference validation.py:614-634: exactly {"type": "custom_vector"}."""
    try:
        jsonschema.validate(instance=mappings_object,
                            schema=CUSTOM_VECTOR_MAPPINGS_SCHEMA)
    except jsonschema.ValidationError as e:
        raise InvalidArgError(
            f"Error validating custom vector mappings object. Reason: "
            f"\n{str(e)}")
    return mappings_object


def validate_delete_docs_request(delete_request,
                                 max_delete_docs_count: Optional[int]):
    """Reference validation.py:637-677: programming errors (wrong request
    type, non-int limit) are RuntimeError; user errors are 400s."""
    from marqo_tpu.core.models.delete_docs_objects import MqDeleteDocsRequest

    if not isinstance(delete_request, MqDeleteDocsRequest):
        raise RuntimeError("Deletion request must be a MqDeleteDocsRequest "
                           "object")
    if not isinstance(max_delete_docs_count, int) or \
            isinstance(max_delete_docs_count, bool):
        raise RuntimeError("max_delete_docs_count must be an int!")
    if not delete_request.document_ids:
        raise InvalidDocumentIdError("doc_ids can't be empty!")
    if not isinstance(delete_request.document_ids, Sequence) or \
            isinstance(delete_request.document_ids, str):
        raise InvalidArgError("documentIds param must be an array of "
                              "strings.")
    if len(delete_request.document_ids) > max_delete_docs_count:
        raise InvalidArgError(
            f"The number of documentIds to delete "
            f"`{len(delete_request.document_ids)}` is greater than the "
            f"limit `{max_delete_docs_count}` set by the env var "
            f"`MARQO_MAX_DELETE_DOCS_COUNT`. ")
    for _id in delete_request.document_ids:
        validate_id(_id)
    return delete_request
