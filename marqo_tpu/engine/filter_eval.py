"""Filter AST evaluation against stored documents.

Role parity: the reference compiles the filter AST to Vespa YQL ``where``
clauses evaluated by Vespa's C++ attribute search
(structured_vespa_index.py filter-term compilation). Our engine evaluates
the AST directly over the doc store (and, for the native engine, compiles
the same AST to a bytecode the C++ side executes).

Semantics:
  - EqualityTerm: string equality on text fields (exact match), numeric
    equality on int/float, bool accepts true/false (case-insensitive),
    arrays match if any element matches, `_id` matches the document id.
  - RangeTerm: numeric fields, inclusive bounds, `*` = unbounded.
  - InTerm: equality against any of the listed values.
  - And/Or/Not: boolean logic.
  - Missing fields never match (NOT over a missing field matches).
"""

from typing import Any, Callable, Dict

from marqo_tpu.core import constants
from marqo_tpu.core.search.search_filter import (And, EqualityTerm, InTerm,
                                                 Node, Not, Or, RangeTerm,
                                                 SearchFilter)


def _values_of(doc: Dict[str, Any], doc_id: str, field: str):
    """All comparable values for a field (lists flattened one level)."""
    if field == constants.MARQO_DOC_ID:
        return [doc_id]
    if field not in doc:
        # map-field dot access: "map_field.key"
        if "." in field:
            base, _, key = field.partition(".")
            value = doc.get(base)
            if isinstance(value, dict) and key in value:
                value = value[key]
            else:
                return []
        else:
            return []
    else:
        value = doc[field]
    if isinstance(value, list):
        return value
    return [value]


def _eq_match(stored: Any, filter_value: str) -> bool:
    if isinstance(stored, bool):
        return filter_value.lower() in ("true", "1") if stored else \
            filter_value.lower() in ("false", "0")
    if isinstance(stored, (int, float)):
        try:
            return float(filter_value) == float(stored)
        except ValueError:
            return False
    if isinstance(stored, str):
        # Vespa string-attribute matching is case-insensitive (match:
        # word lowercases both sides) — reference test_search_
        # unstructured.py:563-606 expects stored "True" to match
        # filter term `true`
        return stored.lower() == filter_value.lower()
    return False


def _range_match(stored: Any, lower, upper) -> bool:
    if isinstance(stored, bool) or not isinstance(stored, (int, float)):
        return False
    if lower is not None and stored < lower:
        return False
    if upper is not None and stored > upper:
        return False
    return True


def evaluate_node(node: Node, doc: Dict[str, Any], doc_id: str) -> bool:
    if isinstance(node, EqualityTerm):
        return any(_eq_match(v, node.value)
                   for v in _values_of(doc, doc_id, node.field))
    if isinstance(node, RangeTerm):
        return any(_range_match(v, node.lower, node.upper)
                   for v in _values_of(doc, doc_id, node.field))
    if isinstance(node, InTerm):
        values = _values_of(doc, doc_id, node.field)
        return any(_eq_match(v, fv) for v in values for fv in node.value_list)
    if isinstance(node, And):
        return (evaluate_node(node.left, doc, doc_id)
                and evaluate_node(node.right, doc, doc_id))
    if isinstance(node, Or):
        return (evaluate_node(node.left, doc, doc_id)
                or evaluate_node(node.right, doc, doc_id))
    if isinstance(node, Not):
        return not evaluate_node(node.modified, doc, doc_id)
    raise TypeError(f"Unknown filter node type: {type(node)}")


def make_filter_fn(search_filter: SearchFilter) -> Callable[[Dict, str], bool]:
    root = search_filter.root

    def fn(doc: Dict[str, Any], doc_id: str) -> bool:
        return evaluate_node(root, doc, doc_id)

    return fn
