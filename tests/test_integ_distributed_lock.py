"""Ported reference tests: distributed DDL lock behavior.

Source: /root/reference/tests/core/distributed_lock/
test_distributed_lock.py — acquire/release round-trip, mutual exclusion
under concurrency (exactly one winner), acquisition timeout, repeated
cycles, independent locks don't interfere, zero-timeout non-blocking
acquire, double-acquire of the same lock fails, and backend failures are
handled gracefully (lock unavailable → acquire returns False rather than
crashing, mirroring kazoo-error fail-soft).
"""

import threading
import time

import pytest

from marqo_tpu.core.distributed_lock import (EngineDistributedLock,
                                             FileDistributedLock,
                                             InProcessDistributedLock)


def _backends(tmp_path):
    return [
        ("in-process", lambda name: InProcessDistributedLock()),
        ("file", lambda name: FileDistributedLock(str(tmp_path),
                                                  name=name)),
    ]


class TestDistributedLock:
    def test_acquire_and_release(self, tmp_path):
        for label, make in _backends(tmp_path):
            lock = make("l1")
            assert lock.acquire(timeout=1.0) is True, label
            lock.release()
            assert lock.acquire(timeout=1.0) is True, label
            lock.release()

    def test_concurrent_acquisition_one_winner(self, tmp_path):
        for label, make in _backends(tmp_path):
            # file locks exclude ACROSS instances; in-process lock objects
            # are shared, so use one instance per semantics
            shared = make("l2")
            results = []

            def attempt(lock):
                results.append(lock.acquire(timeout=0.0))

            locks = ([shared] * 4 if label == "in-process"
                     else [make("l2") for _ in range(4)])
            assert locks[0].acquire(timeout=0.0) is True
            threads = [threading.Thread(target=attempt, args=(l,))
                       for l in locks[1:]]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert results == [False, False, False], (label, results)
            locks[0].release()

    def test_acquisition_timeout_waits_then_fails(self, tmp_path):
        for label, make in _backends(tmp_path):
            holder = make("l3")
            assert holder.acquire(timeout=0.0)
            contender = (holder if label == "in-process" else make("l3"))
            start = time.time()
            assert contender.acquire(timeout=0.3) is False
            assert time.time() - start >= 0.25, label
            holder.release()

    def test_repeated_acquire_release(self, tmp_path):
        for label, make in _backends(tmp_path):
            lock = make("l4")
            for _ in range(5):
                assert lock.acquire(timeout=1.0) is True, label
                lock.release()

    def test_independent_locks(self, tmp_path):
        for label, make in _backends(tmp_path):
            a, b = make("lock-a"), make("lock-b")
            assert a.acquire(timeout=0.0) is True
            assert b.acquire(timeout=0.0) is True, \
                f"{label}: independent locks must not interfere"
            a.release()
            b.release()

    def test_zero_timeout_nonblocking(self, tmp_path):
        for label, make in _backends(tmp_path):
            holder = make("l5")
            assert holder.acquire(timeout=0.0)
            contender = (holder if label == "in-process" else make("l5"))
            start = time.time()
            assert contender.acquire(timeout=0.0) is False
            assert time.time() - start < 0.2, label
            holder.release()

    def test_same_lock_cannot_be_acquired_twice(self, tmp_path):
        for label, make in _backends(tmp_path):
            lock = make("l6")
            assert lock.acquire(timeout=0.0) is True
            assert lock.acquire(timeout=0.0) is False, label
            lock.release()

    def test_engine_lock_backend_failure_fails_soft(self):
        """An unreachable coordination backend must surface as a failed
        acquire, not a crash (reference kazoo-error grace)."""
        lock = EngineDistributedLock("http://127.0.0.1:1",  # closed port
                                     name="l7")
        assert lock.acquire(timeout=0.2) is False
        lock.release()  # must not raise either

    def test_context_manager_raises_when_held(self, tmp_path):
        from marqo_tpu.core.exceptions import OperationConflictError
        holder = FileDistributedLock(str(tmp_path), name="l8")
        assert holder.acquire(timeout=0.0)
        contender = FileDistributedLock(str(tmp_path), name="l8")
        with pytest.raises(Exception) as e:
            with contender.context(timeout=0.1,
                                   failure_message="DDL in progress"):
                pass
        assert "DDL in progress" in str(e.value)
        holder.release()
