"""Engine-hosted coordination primitives: TTL lock + TTL semaphore.

Role parity: the reference spans API replicas with Zookeeper for DDL
mutual exclusion (zookeeper_distributed_lock.py:15-76) and Redis for
cross-worker throttling (redis_throttle.py:18-100). This build hosts the
equivalent shared state on an engine server — the component every API
replica already talks to — so multi-host deployments get both guarantees
with no extra infrastructure. TTLs bound the damage of a crashed holder
(Zookeeper ephemeral nodes / Redis key expiry play the same role).

Mounted by the engine server at /engine/coordination/*; consumed by
EngineDistributedLock (core/distributed_lock.py) and the engine throttle
backend (api/throttling.py).
"""

import threading
import time
from typing import Dict, Tuple


class Coordinator:
    """In-memory named locks and counting semaphores with per-holder TTLs.
    Thread-safe; state is process-local to the hosting engine server (the
    cluster's shard-0 primary by convention, mirroring the reference's
    single ZK/Redis endpoint)."""

    def __init__(self):
        self._mutex = threading.Lock()
        # lock name -> (owner, expiry_ts)
        self._locks: Dict[str, Tuple[str, float]] = {}
        # semaphore name -> {owner: expiry_ts}
        self._semaphores: Dict[str, Dict[str, float]] = {}

    # -- lock --

    def lock_acquire(self, name: str, owner: str, ttl: float) -> bool:
        now = time.monotonic()
        with self._mutex:
            holder = self._locks.get(name)
            if holder is not None and holder[1] > now and holder[0] != owner:
                return False
            self._locks[name] = (owner, now + ttl)
            return True

    def lock_release(self, name: str, owner: str) -> bool:
        with self._mutex:
            holder = self._locks.get(name)
            if holder is not None and holder[0] == owner:
                del self._locks[name]
                return True
            return False

    # -- semaphore --

    def semaphore_acquire(self, name: str, owner: str, limit: int,
                          ttl: float) -> bool:
        now = time.monotonic()
        with self._mutex:
            holders = self._semaphores.setdefault(name, {})
            for stale in [o for o, exp in holders.items() if exp <= now]:
                del holders[stale]
            if owner not in holders and len(holders) >= limit:
                return False
            holders[owner] = now + ttl
            return True

    def semaphore_release(self, name: str, owner: str) -> bool:
        with self._mutex:
            holders = self._semaphores.get(name, {})
            return holders.pop(owner, None) is not None

    def semaphore_count(self, name: str) -> int:
        now = time.monotonic()
        with self._mutex:
            holders = self._semaphores.get(name, {})
            return len([1 for exp in holders.values() if exp > now])
