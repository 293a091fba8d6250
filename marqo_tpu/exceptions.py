"""Base exception hierarchy.

Three tiers, mirroring the reference's design (src/marqo/exceptions.py,
src/marqo/core/exceptions.py, src/marqo/api/exceptions.py):

  - :class:`MarqoError` — root of everything raised by this framework.
  - core-level errors (marqo_tpu.core.exceptions) — domain failures.
  - API-level errors (marqo_tpu.api.exceptions) — carry HTTP status codes.

The API layer owns the ordered core→API mapping (reference api.py:88-141).
"""

from typing import Optional


class MarqoError(Exception):
    """Root exception for the framework (reference src/marqo/exceptions.py:7)."""

    def __init__(self, message: Optional[str] = None, cause: Optional[Exception] = None):
        self.message = message or self.__class__.__name__
        self.cause = cause
        super().__init__(self.message)

    def __str__(self) -> str:
        return f"{self.__class__.__name__}: {self.message}"


class InternalError(MarqoError):
    pass


class InvalidArgumentError(MarqoError):
    pass


class StartupSanityCheckError(MarqoError):
    pass
