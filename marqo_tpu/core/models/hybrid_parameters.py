"""Hybrid search parameters.

Parity: reference core/models/hybrid_parameters.py:11-23 — retrieval ∈
{disjunction, lexical, tensor}, ranking ∈ {rrf, lexical, tensor}, alpha
(default 0.5), rrfK (default 60), per-leg searchable attributes and score
modifiers, plus the full cross-validation matrix.
"""

from enum import Enum
from typing import Dict, List, Optional

from pydantic import BaseModel, ConfigDict, field_validator, model_validator


class RetrievalMethod(str, Enum):
    Disjunction = "disjunction"
    Tensor = "tensor"
    Lexical = "lexical"


class RankingMethod(str, Enum):
    RRF = "rrf"
    Tensor = "tensor"
    Lexical = "lexical"


class ScoreModifierOperator(BaseModel):
    """One {"field_name": ..., "weight": ...} entry (reference
    score_modifiers_object.py:20-32): extra keys are rejected, weight
    defaults to 1, and `_id` is not a modifiable field."""
    model_config = ConfigDict(extra="forbid", frozen=True)

    field_name: str
    weight: float = 1

    @field_validator("field_name")
    @classmethod
    def _name_not_id(cls, v):
        if v == "_id":
            from marqo_tpu.api.exceptions import InvalidArgError
            raise InvalidArgError("_id is not allowed as a field_name")
        return v


class ScoreModifierLists(BaseModel):
    """API-facing score-modifier lists: {"multiply_score_by": [...],
    "add_to_score": [...]} (reference score_modifiers_object.py:35-62):
    at least one list must be provided and provided lists must be
    non-empty; any shape error surfaces as the API-level 400
    (ScoreModifierValidationError), never a bare pydantic error."""
    model_config = ConfigDict(extra="forbid")

    multiply_score_by: Optional[List[ScoreModifierOperator]] = None
    add_to_score: Optional[List[ScoreModifierOperator]] = None

    def __init__(self, **data):
        from pydantic import ValidationError as PydanticValidationError

        from marqo_tpu.api.exceptions import InvalidArgError
        try:
            super().__init__(**data)
        except PydanticValidationError as e:
            raise InvalidArgError(
                f"Error validating score_modifiers = `{data}`. Reason: "
                f"\n{e}. Please revise your score_modifiers based on the "
                f"provided error.")

    @model_validator(mode="after")
    def _at_least_one(self):
        # lives in a validator (not __init__) so nested parsing — e.g.
        # SearchQuery.scoreModifiers — enforces it too; InvalidArgError is
        # not a ValueError, so pydantic propagates it to the caller as the
        # API-level 400 instead of wrapping it
        from marqo_tpu.api.exceptions import InvalidArgError
        if self.multiply_score_by is None and self.add_to_score is None:
            raise InvalidArgError(
                "Error validating score_modifiers. Reason: At least one of "
                "multiply_score_by or add_to_score must be provided")
        for name in ("multiply_score_by", "add_to_score"):
            v = getattr(self, name)
            if v is not None and len(v) < 1:
                raise InvalidArgError(
                    f"Error validating score_modifiers. Reason: At least "
                    f"one ScoreModifierOperator is required in {name}")
        return self

    def to_score_modifiers(self) -> List:
        from marqo_tpu.core.models.score_modifier import (ScoreModifier,
                                                          ScoreModifierType)
        mods = []
        for m in self.multiply_score_by or []:
            mods.append(ScoreModifier(field=m.field_name, weight=m.weight,
                                      type=ScoreModifierType.Multiply))
        for m in self.add_to_score or []:
            mods.append(ScoreModifier(field=m.field_name, weight=m.weight,
                                      type=ScoreModifierType.Add))
        return mods


class HybridParameters(BaseModel):
    model_config = ConfigDict(extra="forbid")

    retrievalMethod: RetrievalMethod = RetrievalMethod.Disjunction
    rankingMethod: RankingMethod = RankingMethod.RRF
    alpha: Optional[float] = None
    rrfK: Optional[int] = None
    searchableAttributesLexical: Optional[List[str]] = None
    searchableAttributesTensor: Optional[List[str]] = None
    verbose: bool = False
    scoreModifiersLexical: Optional[ScoreModifierLists] = None
    scoreModifiersTensor: Optional[ScoreModifierLists] = None

    @field_validator("alpha")
    @classmethod
    def _validate_alpha(cls, alpha):
        if alpha is not None and not (0 <= alpha <= 1):
            raise ValueError("alpha can only be between 0 and 1")
        return alpha

    @field_validator("rrfK")
    @classmethod
    def _validate_rrf_k(cls, rrfK):
        if rrfK is not None and rrfK < 0:
            raise ValueError("rrfK can only be greater than or equal to 0")
        return rrfK

    @model_validator(mode="after")
    def _validate_combinations(self):
        fusion_methods = [RankingMethod.RRF]
        if self.alpha is None:
            if self.rankingMethod in fusion_methods:
                object.__setattr__(self, "alpha", 0.5)
        elif self.rankingMethod not in fusion_methods:
            raise ValueError("'alpha' can only be defined for 'rrf' ranking method")

        if self.rrfK is None:
            if self.rankingMethod == RankingMethod.RRF:
                object.__setattr__(self, "rrfK", 60)
        elif self.rankingMethod != RankingMethod.RRF:
            raise ValueError("'rrfK' can only be defined for 'rrf' ranking method")

        if self.searchableAttributesLexical is not None:
            if not (self.retrievalMethod in (RetrievalMethod.Lexical,
                                             RetrievalMethod.Disjunction)
                    or self.rankingMethod == RankingMethod.Lexical):
                raise ValueError(
                    "'searchableAttributesLexical' can only be defined for "
                    "'lexical', 'disjunction' retrieval methods or 'lexical' "
                    "ranking method")

        if self.searchableAttributesTensor is not None:
            if not (self.retrievalMethod in (RetrievalMethod.Tensor,
                                             RetrievalMethod.Disjunction)
                    or self.rankingMethod == RankingMethod.Tensor):
                raise ValueError(
                    "'searchableAttributesTensor' can only be defined for "
                    "'tensor', 'disjunction' retrieval methods or 'tensor' "
                    "ranking method")

        if self.scoreModifiersLexical is not None:
            if not (self.rankingMethod in (RankingMethod.Lexical, RankingMethod.RRF)
                    or self.retrievalMethod == RetrievalMethod.Lexical):
                raise ValueError(
                    "'scoreModifiersLexical' can only be defined for 'lexical', "
                    "'rrf' ranking methods or 'lexical' retrieval method.")

        if self.scoreModifiersTensor is not None:
            if self.rankingMethod not in (RankingMethod.Tensor, RankingMethod.RRF):
                raise ValueError(
                    "'scoreModifiersTensor' can only be defined for 'tensor', "
                    "'rrf', ranking methods")

        if self.retrievalMethod == RetrievalMethod.Disjunction:
            if self.rankingMethod != RankingMethod.RRF:
                raise ValueError(
                    "For retrievalMethod: disjunction, rankingMethod must be: rrf")

        if self.retrievalMethod in (RetrievalMethod.Lexical, RetrievalMethod.Tensor):
            if self.rankingMethod not in (RankingMethod.Lexical, RankingMethod.Tensor):
                raise ValueError(
                    "For retrievalMethod: tensor or lexical, rankingMethod "
                    "must be: tensor or lexical")
        return self
