"""Concurrency throttling.

Parity: reference src/marqo/tensor_search/throttling/redis_throttle.py —
per-operation concurrency caps (INDEX=8, SEARCH=8, PARTIAL_UPDATE=100,
api/configs.py:28-30,49), 429 on breach, and FAIL-OPEN on limiter failure
(:26,71-75). Single-process deployments use in-process counters; a Redis
implementation can plug in behind the same decorator for multi-replica
admission control (SURVEY.md D6).
"""

import threading
from enum import Enum
from functools import wraps

from marqo_tpu.api import configs
from marqo_tpu.api.exceptions import TooManyRequestsError
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class RequestType(str, Enum):
    INDEX = "INDEX"
    SEARCH = "SEARCH"
    DELETE = "DELETE"
    PARTIAL_UPDATE = "PARTIAL_UPDATE"


_ENV_BY_TYPE = {
    RequestType.INDEX: "MARQO_MAX_CONCURRENT_INDEX",
    RequestType.SEARCH: "MARQO_MAX_CONCURRENT_SEARCH",
    RequestType.DELETE: "MARQO_MAX_CONCURRENT_INDEX",
    RequestType.PARTIAL_UPDATE: "MARQO_MAX_CONCURRENT_PARTIAL_UPDATE",
}


class _Counter:
    def __init__(self):
        self.value = 0
        self.lock = threading.Lock()

    def try_acquire(self, limit: int) -> bool:
        with self.lock:
            if self.value >= limit:
                return False
            self.value += 1
            return True

    def release(self) -> None:
        with self.lock:
            self.value = max(0, self.value - 1)


_counters = {rt: _Counter() for rt in RequestType}


def current_concurrency(request_type: RequestType) -> int:
    return _counters[request_type].value


def throttle(request_type: RequestType):
    """Decorator enforcing the per-operation concurrency cap."""

    def decorator(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            if not configs.read_env_vars_and_defaults_bool(
                    "MARQO_ENABLE_THROTTLING"):
                return fn(*args, **kwargs)
            limit = configs.read_env_vars_and_defaults_ints(
                _ENV_BY_TYPE[request_type])
            counter = _counters[request_type]
            try:
                acquired = counter.try_acquire(limit)
            except Exception as e:  # fail open, never block traffic
                logger.warning(f"Throttling check failed (fail-open): {e}")
                return fn(*args, **kwargs)
            if not acquired:
                raise TooManyRequestsError(
                    f"Throttled by Marqo {request_type.value} throttling: "
                    f"maximum concurrent operations ({limit}) reached. "
                    f"Please try again later.")
            try:
                return fn(*args, **kwargs)
            finally:
                counter.release()

        return wrapper

    return decorator
