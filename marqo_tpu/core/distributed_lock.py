"""DDL mutual-exclusion locks.

Parity: reference src/marqo/core/distributed_lock/ — an abstract lock with
non-blocking acquire + timeout (zookeeper_distributed_lock.py:15-76), used
to serialize index create/delete/update across API replicas
(index_management.py:333-363). Single-process deployments use the
in-process implementation; multi-replica deployments plug a ZK/etcd-backed
implementation behind the same interface. Acquisition failure raises
OperationConflictError, and a missing lock degrades to no-DDL mode with a
warning (reference config.py:68-81 semantics live in the caller).
"""

import threading
from abc import ABC, abstractmethod
from contextlib import contextmanager

from marqo_tpu.core.exceptions import OperationConflictError


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


def get_deployment_lock() -> AbstractDistributedLock:
    return InProcessDistributedLock()
