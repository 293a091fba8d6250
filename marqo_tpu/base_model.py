"""Base pydantic models (parity: reference src/marqo/base_model.py).

pydantic v2 (the reference uses v1); camelCase aliasing preserved so API
request/response JSON matches the reference byte-for-byte.
"""

from pydantic import BaseModel, ConfigDict
from pydantic.alias_generators import to_camel


class StrictBaseModel(BaseModel):
    model_config = ConfigDict(extra="forbid", validate_assignment=True)


class ImmutableBaseModel(BaseModel):
    model_config = ConfigDict(frozen=True)


class ImmutableStrictBaseModel(BaseModel):
    model_config = ConfigDict(extra="forbid", frozen=True)


class MarqoBaseModel(BaseModel):
    """camelCase-aliased API model (reference base_model.py MarqoBaseModel)."""
    model_config = ConfigDict(
        alias_generator=to_camel,
        populate_by_name=True,
        extra="forbid",
    )
