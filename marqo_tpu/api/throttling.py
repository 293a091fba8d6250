"""Concurrency throttling.

Parity: reference src/marqo/tensor_search/throttling/redis_throttle.py —
per-operation concurrency caps (INDEX=8, SEARCH=8, PARTIAL_UPDATE=100,
api/configs.py:28-30,49), 429 on breach, and FAIL-OPEN on limiter failure
(:26,71-75).

Backends (MARQO_COORDINATION_BACKEND, same selector as the DDL lock):
  in_process (default) — per-process counters.
  file                 — pid-stamped slot files under
                         MARQO_COORDINATION_DIR: the cap spans every API
                         process on the host; slots of dead pids are
                         reclaimed (the reference's Redis key-expiry role).
  engine               — TTL semaphore hosted on an engine server
                         (MARQO_COORDINATION_URL), spanning replicas across
                         hosts like the reference's shared Redis.
All backends FAIL OPEN: a broken limiter logs a warning and admits the
request (reference redis_throttle.py:71-75).
"""

import os
import threading
import time
import uuid
from enum import Enum
from functools import wraps

from marqo_tpu.api import configs
from marqo_tpu.api.exceptions import TooManyRequestsError
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class RequestType(str, Enum):
    INDEX = "INDEX"
    SEARCH = "SEARCH"
    # DELETE exists in the reference enum but NO endpoint throttles it
    # (reference api.py decorates only SEARCH/INDEX/PARTIAL_UPDATE;
    # redis_throttle's limit table has no DELETE key) — kept here for
    # enum parity, deliberately absent from _ENV_BY_TYPE
    DELETE = "DELETE"
    PARTIAL_UPDATE = "PARTIAL_UPDATE"


_ENV_BY_TYPE = {
    RequestType.INDEX: "MARQO_MAX_CONCURRENT_INDEX",
    RequestType.SEARCH: "MARQO_MAX_CONCURRENT_SEARCH",
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


class _InProcessBackend:
    def try_acquire(self, request_type: RequestType, limit: int):
        """Returns an opaque release token, or None when at the cap."""
        counter = _counters[request_type]
        return counter if counter.try_acquire(limit) else None

    def release(self, request_type: RequestType, token) -> None:
        token.release()


class _FileBackend:
    """Cross-process host-wide concurrency: slot i is held by creating
    `<dir>/throttle_<TYPE>/slot_<i>` exclusively with the holder's pid
    inside; slots whose pid is dead are reclaimed, so a crashed worker
    can't leak capacity."""

    def __init__(self, directory: str):
        self._dir = directory

    def _slot_dir(self, request_type: RequestType) -> str:
        path = os.path.join(self._dir, f"throttle_{request_type.value}")
        os.makedirs(path, exist_ok=True)
        return path

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True

    def try_acquire(self, request_type: RequestType, limit: int):
        slot_dir = self._slot_dir(request_type)
        for i in range(limit):
            path = os.path.join(slot_dir, f"slot_{i}")
            for _attempt in (0, 1):  # second attempt after stale reclaim
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, str(os.getpid()).encode())
                    os.close(fd)
                    return path
                except FileExistsError:
                    try:
                        with open(path) as f:
                            holder = int(f.read().strip() or "0")
                    except (OSError, ValueError):
                        break  # concurrent writer; try next slot
                    if holder == 0:
                        # pid not yet written: the creator is between its
                        # O_EXCL create and write — stealing here would
                        # double-admit the slot AND let whichever release
                        # runs first free the other's live slot. Only if
                        # the empty file is old (creator died in that
                        # two-syscall window) is it genuinely stale.
                        try:
                            age = time.time() - os.path.getmtime(path)
                        except OSError:
                            break
                        if age < 10.0:
                            break  # in-progress create; try next slot
                    elif self._pid_alive(holder):
                        break  # genuinely held; try next slot
                    # Stale slot from a dead process. Reclaim via atomic
                    # rename: exactly ONE contender wins the rename; a
                    # plain unlink here could delete a slot another
                    # process just re-acquired, over-admitting past the
                    # cap. (Residual window — holder dies and the slot is
                    # reclaimed AND re-acquired between our read and the
                    # rename — can transiently over-admit by one, the same
                    # fail-open posture as the reference's Redis throttle.)
                    claim = f"{path}.reclaim.{os.getpid()}"
                    try:
                        os.rename(path, claim)
                    except FileNotFoundError:
                        continue  # lost the race; retry the O_EXCL create
                    try:
                        os.unlink(claim)
                    except FileNotFoundError:
                        pass
        return None

    def release(self, request_type: RequestType, token) -> None:
        try:
            os.unlink(token)
        except FileNotFoundError:
            pass


class _EngineBackend:
    """Cluster-wide concurrency via the engine-hosted TTL semaphore
    (engine/coordination.py). The TTL reclaims slots of crashed workers."""

    def __init__(self, base_url: str, ttl: float = 600.0,
                 timeout_s: float = 5.0):
        import httpx
        self._client = httpx.Client(base_url=base_url.rstrip("/"),
                                    timeout=timeout_s)
        self._ttl = ttl

    def try_acquire(self, request_type: RequestType, limit: int):
        owner = uuid.uuid4().hex
        response = self._client.post(
            "/engine/coordination/semaphore/acquire",
            json={"name": f"throttle_{request_type.value}", "owner": owner,
                  "limit": limit, "ttl": self._ttl})
        response.raise_for_status()
        return owner if response.json().get("acquired") else None

    def release(self, request_type: RequestType, token) -> None:
        self._client.post(
            "/engine/coordination/semaphore/release",
            json={"name": f"throttle_{request_type.value}", "owner": token})

    def close(self) -> None:
        self._client.close()


_backend = None
_backend_lock = threading.Lock()


def _get_backend():
    global _backend
    if _backend is not None:
        return _backend
    with _backend_lock:
        if _backend is not None:
            return _backend
        kind = (configs.read_env_vars_and_defaults(
            "MARQO_COORDINATION_BACKEND") or "in_process").lower()
        if kind == "file":
            from marqo_tpu.core.distributed_lock import _coordination_dir
            _backend = _FileBackend(_coordination_dir())
        elif kind == "engine":
            url = configs.read_env_vars_and_defaults("MARQO_COORDINATION_URL")
            if url:
                _backend = _EngineBackend(str(url))
            else:
                logger.warning(
                    "MARQO_COORDINATION_BACKEND=engine but "
                    "MARQO_COORDINATION_URL is unset; throttling falls back "
                    "to per-process counters")
                _backend = _InProcessBackend()
        else:
            _backend = _InProcessBackend()
        return _backend


def reset_backend() -> None:
    """Re-read the backend env selection (tests / reconfiguration)."""
    global _backend
    with _backend_lock:
        old = _backend
        _backend = None
    if old is not None and hasattr(old, "close"):
        try:
            old.close()  # don't leak the engine backend's HTTP pool
        except Exception:
            pass


def throttle(request_type: RequestType):
    """Decorator enforcing the per-operation concurrency cap."""

    def decorator(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            if not configs.read_env_vars_and_defaults_bool(
                    "MARQO_ENABLE_THROTTLING"):
                return fn(*args, **kwargs)
            try:
                # the WHOLE limiter path fails open — including a
                # malformed limit env var or a backend that won't
                # construct — matching the reference's posture of
                # admitting traffic on any limiter error
                # (redis_throttle.py:71-75); a loud warning still tells
                # the operator their config is broken
                limit = configs.read_env_vars_and_defaults_ints(
                    _ENV_BY_TYPE[request_type])
                backend = _get_backend()
                token = backend.try_acquire(request_type, limit)
            except Exception as e:  # fail open, never block traffic
                logger.warning(f"Throttling check failed (fail-open): {e}")
                return fn(*args, **kwargs)
            if token is None:
                raise TooManyRequestsError(
                    f"Throttled by Marqo {request_type.value} throttling: "
                    f"maximum concurrent operations ({limit}) reached. "
                    f"Please try again later.")
            try:
                return fn(*args, **kwargs)
            finally:
                try:
                    backend.release(request_type, token)
                except Exception as e:
                    logger.warning(f"Throttle release failed: {e}")

        return wrapper

    return decorator
