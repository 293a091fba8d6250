"""Query domain models (parity: reference core/models/marqo_query.py:13-58)."""

from typing import List, Optional

from pydantic import BaseModel, ConfigDict, field_validator, model_validator

from marqo_tpu.core.models.hybrid_parameters import HybridParameters
from marqo_tpu.core.models.score_modifier import ScoreModifier
from marqo_tpu.core.search.search_filter import (MarqoFilterStringParser,
                                                 SearchFilter)


class MarqoQuery(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)

    index_name: str
    limit: int
    offset: Optional[int] = None
    searchable_attributes: Optional[List[str]] = None
    attributes_to_retrieve: Optional[List[str]] = None
    filter: Optional[SearchFilter] = None
    score_modifiers: Optional[List[ScoreModifier]] = None
    expose_facets: bool = False

    @field_validator("filter", mode="before")
    @classmethod
    def _parse_filter(cls, v):
        if v is None or isinstance(v, SearchFilter):
            return v
        if isinstance(v, str):
            return MarqoFilterStringParser().parse(v)
        raise ValueError(
            f"filter has to be a string or a SearchFilter, got {type(v)}")


class MarqoTensorQuery(MarqoQuery):
    vector_query: List[float]
    ef_search: Optional[int] = None
    approximate: bool = True


class MarqoLexicalQuery(MarqoQuery):
    or_phrases: List[str]
    and_phrases: List[str]


class MarqoHybridQuery(MarqoTensorQuery, MarqoLexicalQuery):
    hybrid_parameters: HybridParameters
    score_modifiers_lexical: Optional[List[ScoreModifier]] = None
    score_modifiers_tensor: Optional[List[ScoreModifier]] = None

    @model_validator(mode="before")
    @classmethod
    def _validate_no_global_params(cls, values):
        if isinstance(values, dict):
            if values.get("score_modifiers") is not None:
                raise ValueError(
                    "'scoreModifiers' cannot be used for hybrid search. "
                    "Instead, define the 'scoreModifiersTensor' and/or "
                    "'scoreModifiersLexical' keys inside the "
                    "'hybridParameters' dict parameter.")
            if values.get("searchable_attributes") is not None:
                raise ValueError(
                    "'searchableAttributes' cannot be used for hybrid search. "
                    "Instead, define the 'searchableAttributesTensor' and/or "
                    "'searchableAttributesLexical' keys inside the "
                    "'hybridParameters' dict parameter.")
        return values
