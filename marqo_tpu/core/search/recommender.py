"""Recommender: "more documents like these".

Parity: reference src/marqo/core/search/recommender.py:22-214 — fetch the
given documents' stored embeddings, interpolate them (LERP default for
unnormalized, SLERP for normalized indexes), then run a context-only tensor
search excluding the input documents via a generated `NOT _id IN (...)`
filter (:178-205).
"""

from typing import Dict, List, Optional, Union

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.core.utils.vector_interpolation import (InterpolationMethod,
                                                       from_interpolation_method)


class Recommender:
    def __init__(self, config):
        self.config = config

    def _default_interpolation(self, index) -> InterpolationMethod:
        return (InterpolationMethod.SLERP if index.normalize_embeddings
                else InterpolationMethod.LERP)

    @staticmethod
    def _exclusion_filter(doc_ids: List[str], existing: Optional[str],
                          structured: bool) -> str:
        """Reference recommender.py:205-214: `NOT _id IN (...)` on
        structured indexes, `NOT (_id:(a) OR _id:(b))` on unstructured
        (IN is structured-only at the filter layer)."""
        escaped = [i.replace("\\", "\\\\").replace(" ", "\\ ")
                   .replace("(", "\\(").replace(")", "\\)")
                   .replace(",", "\\,")  # a comma would split the IN list
                   for i in doc_ids]
        if structured:
            exclusion = f"NOT _id IN ({', '.join(escaped)})"
        else:
            # ungrouped escaped terms: the lexer unescapes \x in bare
            # values (grouped (...) values are literal, so escapes would
            # be kept raw and comma ids would not match)
            exclusion = "NOT (" + " OR ".join(
                f"_id:{i}" for i in escaped) + ")"
        if existing:
            return f"({existing}) AND {exclusion}"
        return exclusion

    def recommend(self, index_name: str,
                  documents: Union[List[str], Dict[str, float]],
                  tensor_fields: Optional[List[str]] = None,
                  interpolation_method: Optional[str] = None,
                  exclude_input_documents: bool = True,
                  limit: int = 10, offset: int = 0,
                  ef_search: Optional[int] = None,
                  approximate: Optional[bool] = None,
                  searchable_attributes: Optional[List[str]] = None,
                  filter: Optional[str] = None,
                  attributes_to_retrieve: Optional[List[str]] = None,
                  score_modifiers: Optional[dict] = None,
                  show_highlights: bool = True) -> dict:
        from marqo_tpu.tensor_search import tensor_search

        index = self.config.index_meta_cache.get_index(index_name)
        if not documents:
            raise InvalidArgumentError(
                "No documents given to recommend from")
        # zero-weight docs are removed BEFORE fetching, but still excluded
        # from the results (reference recommender.py:70-81,173-174)
        if isinstance(documents, dict):
            all_doc_ids = list(documents)
            weights = {k: v for k, v in documents.items() if v != 0}
            doc_ids = list(weights)
        else:
            all_doc_ids = list(documents)
            doc_ids = list(documents)
            weights = {doc_id: 1.0 for doc_id in doc_ids}
        if not doc_ids:
            raise InvalidArgumentError(
                "No documents with non-zero weight provided")

        from marqo_tpu.core.models.marqo_index import IndexType
        if index.type == IndexType.Structured and tensor_fields is not None:
            # reference recommender.py:90-97: unknown tensor fields are an
            # InvalidFieldNameError naming the valid ones
            valid = set(index.tensor_field_map)
            for tensor_field in tensor_fields:
                if tensor_field not in valid:
                    from marqo_tpu.api.exceptions import                         InvalidFieldNameError
                    raise InvalidFieldNameError(
                        f'Tensor field "{tensor_field}" not found in index '
                        f'"{index_name}". Available tensor fields: '
                        f'{", ".join(valid)}')

        try:
            method = (InterpolationMethod(interpolation_method)
                      if interpolation_method
                      else self._default_interpolation(index))
        except ValueError:
            # reference: pydantic-validated enum on the request model — an
            # unknown method is the caller's 400, not a server error
            raise InvalidArgumentError(
                f"Invalid interpolation method `{interpolation_method}`. "
                f"Must be one of "
                f"{[m.value for m in InterpolationMethod]}")
        interpolator = from_interpolation_method(method)

        vectors: List[List[float]] = []
        vector_weights: List[float] = []
        missing: List[str] = []
        without_vectors: List[str] = []
        for doc_id in doc_ids:
            tensors = self.config.engine.get_tensors(index.schema_name, doc_id)
            doc_vectors = []
            for field, entries in tensors.items():
                if tensor_fields is not None and field not in tensor_fields:
                    continue
                doc_vectors.extend(e["embedding"] for e in entries)
            if not doc_vectors:
                if self.config.engine.get(index.schema_name, doc_id) is None:
                    missing.append(doc_id)
                else:
                    # an existing doc WITHOUT embeddings for the requested
                    # fields is an error (reference recommender.py:128-133)
                    without_vectors.append(doc_id)
                continue
            for vec in doc_vectors:
                vectors.append(vec)
                # every chunk vector carries the document's FULL weight
                # (reference recommender.py:141-142 extends
                # [weight] * len(vector_list) — no per-chunk division, so
                # many-chunk documents pull the interpolation harder)
                vector_weights.append(float(weights[doc_id]))
        if missing:
            raise api_exceptions.InvalidArgError(
                f"The following document IDs were not found: "
                f"{', '.join(missing)}")
        if without_vectors:
            raise api_exceptions.InvalidArgError(
                f"The following documents do not have embeddings: "
                f"{', '.join(without_vectors)}")
        if not vectors:
            raise api_exceptions.InvalidArgError(
                "None of the given documents have tensors for the requested "
                "tensor fields")

        interpolated = interpolator.interpolate(vectors, vector_weights)

        structured = index.type == IndexType.Structured
        # the exclusion filter covers ALL input ids, zero-weight included
        search_filter = (self._exclusion_filter(all_doc_ids, filter,
                                                structured)
                         if exclude_input_documents else filter)
        return tensor_search.search(
            self.config, index_name, text=None,
            context={"tensor": [{"vector": interpolated, "weight": 1.0}]},
            limit=limit, offset=offset, ef_search=ef_search,
            approximate=approximate,
            searchable_attributes=searchable_attributes,
            filter=search_filter,
            attributes_to_retrieve=attributes_to_retrieve,
            score_modifiers=score_modifiers,
            show_highlights=show_highlights)
