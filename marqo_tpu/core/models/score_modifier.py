"""Score modifier model (parity: reference core/models/score_modifier.py)."""

from enum import Enum

from pydantic import BaseModel, ConfigDict


class ScoreModifierType(str, Enum):
    Multiply = "multiply"
    Add = "add"


class ScoreModifier(BaseModel):
    model_config = ConfigDict(extra="forbid")

    field: str
    weight: float
    type: ScoreModifierType
