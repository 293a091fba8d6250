"""DDL mutual-exclusion locks.

Parity: reference src/marqo/core/distributed_lock/ — an abstract lock with
non-blocking acquire + timeout (zookeeper_distributed_lock.py:15-76), used
to serialize index create/delete/update across API replicas
(index_management.py:333-363). Acquisition failure raises
OperationConflictError, and a missing lock degrades to no-DDL mode with a
warning (reference config.py:68-81 semantics live in the caller).

Backends (MARQO_COORDINATION_BACKEND):
  in_process (default) — threading.Lock; one API process.
  file                 — fcntl.flock on MARQO_COORDINATION_DIR; serializes
                         DDL across API replicas on ONE host (the OS drops
                         the lock if the holder crashes).
  engine               — TTL lock hosted on an engine server
                         (MARQO_COORDINATION_URL, engine/coordination.py);
                         spans API replicas across hosts the way the
                         reference uses Zookeeper.
"""

import os
import threading
import time
import uuid
from abc import ABC, abstractmethod
from contextlib import contextmanager

from marqo_tpu.core.exceptions import OperationConflictError
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class AbstractDistributedLock(ABC):
    @abstractmethod
    def acquire(self, timeout: float = 0.0) -> bool:
        ...

    @abstractmethod
    def release(self) -> None:
        ...

    @contextmanager
    def context(self, timeout: float = 0.0,
                failure_message: str = "Another index operation is in progress"):
        if not self.acquire(timeout):
            raise OperationConflictError(failure_message)
        try:
            yield
        finally:
            self.release()


class InProcessDistributedLock(AbstractDistributedLock):
    """threading.Lock-backed deployment lock (single-process)."""

    def __init__(self):
        self._lock = threading.Lock()

    def acquire(self, timeout: float = 0.0) -> bool:
        if timeout <= 0:
            return self._lock.acquire(blocking=False)
        return self._lock.acquire(timeout=timeout)

    def release(self) -> None:
        if self._lock.locked():
            self._lock.release()


class FileDistributedLock(AbstractDistributedLock):
    """flock-backed deployment lock: mutual exclusion across API processes
    sharing a filesystem (one host, or shared storage). The kernel releases
    the lock when the holding process exits — no stale-lock cleanup."""

    def __init__(self, directory: str, name: str = "marqo_ddl"):
        os.makedirs(directory, exist_ok=True)
        self._path = os.path.join(directory, f"{name}.lock")
        self._fd = None
        # serialize within-process acquires too (flock is per-process)
        self._thread_lock = threading.Lock()

    def acquire(self, timeout: float = 0.0) -> bool:
        import fcntl
        if not self._thread_lock.acquire(
                blocking=timeout > 0, timeout=timeout if timeout > 0 else -1):
            return False
        deadline = time.monotonic() + max(timeout, 0.0)
        fd = os.open(self._path, os.O_CREAT | os.O_RDWR, 0o644)
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                os.ftruncate(fd, 0)
                os.write(fd, str(os.getpid()).encode())
                self._fd = fd
                return True
            except OSError:
                if time.monotonic() >= deadline:
                    os.close(fd)
                    self._thread_lock.release()
                    return False
                time.sleep(0.05)

    def release(self) -> None:
        import fcntl
        if self._fd is not None:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_UN)
                os.close(self._fd)
            finally:
                self._fd = None
                self._thread_lock.release()


class EngineDistributedLock(AbstractDistributedLock):
    """Deployment lock hosted on an engine server (multi-host API replicas;
    /engine/coordination/lock/*, engine/coordination.py). The TTL bounds a
    crashed holder the way Zookeeper's ephemeral node does in the
    reference. Backend unreachability counts as acquisition failure —
    DDL fails closed, regular traffic is unaffected."""

    def __init__(self, base_url: str, name: str = "marqo_ddl",
                 ttl: float = 120.0, timeout_s: float = 10.0):
        import httpx
        self._client = httpx.Client(base_url=base_url.rstrip("/"),
                                    timeout=timeout_s)
        self._name = name
        self._ttl = ttl
        self._owner = uuid.uuid4().hex

    def _post(self, action: str, payload: dict) -> dict:
        response = self._client.post(f"/engine/coordination/lock/{action}",
                                     json=payload)
        response.raise_for_status()
        return response.json()

    def acquire(self, timeout: float = 0.0) -> bool:
        deadline = time.monotonic() + max(timeout, 0.0)
        while True:
            try:
                out = self._post("acquire", {
                    "name": self._name, "owner": self._owner,
                    "ttl": self._ttl})
            except Exception as e:
                logger.warning(f"Coordination backend unreachable; DDL lock "
                               f"acquisition failed closed: {e}")
                return False
            if out.get("acquired"):
                return True
            if time.monotonic() >= deadline:
                return False
            time.sleep(0.1)

    def release(self) -> None:
        try:
            self._post("release", {"name": self._name, "owner": self._owner})
        except Exception as e:
            logger.warning(f"Coordination backend unreachable on lock "
                           f"release (TTL will expire it): {e}")


def _coordination_dir() -> str:
    from marqo_tpu.api import configs
    configured = configs.read_env_vars_and_defaults("MARQO_COORDINATION_DIR")
    if configured:
        return str(configured)
    data_dir = configs.read_env_vars_and_defaults("MARQO_ENGINE_DATA_DIR")
    if data_dir:
        return os.path.join(str(data_dir), "coordination")
    return os.path.join("/tmp", "marqo_coordination")


def get_deployment_lock() -> AbstractDistributedLock:
    from marqo_tpu.api import configs
    backend = (configs.read_env_vars_and_defaults(
        "MARQO_COORDINATION_BACKEND") or "in_process").lower()
    if backend == "file":
        return FileDistributedLock(_coordination_dir())
    if backend == "engine":
        url = configs.read_env_vars_and_defaults("MARQO_COORDINATION_URL")
        if not url:
            logger.warning(
                "MARQO_COORDINATION_BACKEND=engine but MARQO_COORDINATION_URL"
                " is unset; falling back to the in-process lock — concurrent"
                " index operations across replicas may race")
            return InProcessDistributedLock()
        return EngineDistributedLock(str(url))
    return InProcessDistributedLock()
