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


class ScoreModifierLists(BaseModel):
    """API-facing score-modifier lists: {"multiply_score_by": [...],
    "add_to_score": [...]} (reference score_modifiers_object.py)."""
    model_config = ConfigDict(extra="forbid")

    multiply_score_by: List[Dict] = []
    add_to_score: List[Dict] = []

    def to_score_modifiers(self) -> List:
        from marqo_tpu.core.models.score_modifier import (ScoreModifier,
                                                          ScoreModifierType)
        mods = []
        for m in self.multiply_score_by:
            mods.append(ScoreModifier(field=m["field_name"],
                                      weight=m.get("weight", 1.0),
                                      type=ScoreModifierType.Multiply))
        for m in self.add_to_score:
            mods.append(ScoreModifier(field=m["field_name"],
                                      weight=m.get("weight", 1.0),
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
