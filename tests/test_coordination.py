"""Cross-replica coordination backends: DDL lock + throttling that span
API processes (reference: Zookeeper lock zookeeper_distributed_lock.py:15,
Redis throttle redis_throttle.py:18-100). Two-process tests prove the
guarantees actually cross process boundaries."""

import os
import subprocess
import sys
import time

import pytest

from marqo_tpu.api.http_framework import serve
from marqo_tpu.core.distributed_lock import (EngineDistributedLock,
                                             FileDistributedLock,
                                             get_deployment_lock,
                                             InProcessDistributedLock)
from marqo_tpu.engine.server import build_engine_app
from marqo_tpu.engine.store import StoreEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(code: str, env_extra=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **(env_extra or {}))
    return subprocess.Popen([sys.executable, "-c", code], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)


HOLD_LOCK_CODE = """
import sys, time
sys.path.insert(0, {repo!r})
from marqo_tpu.core.distributed_lock import FileDistributedLock
lock = FileDistributedLock({dir!r})
assert lock.acquire(timeout=5)
print("HELD", flush=True)
time.sleep({hold})
lock.release()
print("RELEASED", flush=True)
"""


class TestFileLock:
    def test_two_process_mutual_exclusion(self, tmp_path):
        proc = _spawn(HOLD_LOCK_CODE.format(repo=REPO, dir=str(tmp_path),
                                            hold=3.0))
        assert proc.stdout.readline().strip() == "HELD"
        lock = FileDistributedLock(str(tmp_path))
        start = time.monotonic()
        assert lock.acquire(timeout=0.3) is False  # other PROCESS holds it
        # once the holder releases, acquisition succeeds
        assert lock.acquire(timeout=10)
        assert time.monotonic() - start > 1.0  # actually waited for release
        lock.release()
        proc.wait(timeout=10)

    def test_crash_releases_lock(self, tmp_path):
        proc = _spawn(HOLD_LOCK_CODE.format(repo=REPO, dir=str(tmp_path),
                                            hold=60.0))
        assert proc.stdout.readline().strip() == "HELD"
        proc.kill()
        proc.wait(timeout=10)
        lock = FileDistributedLock(str(tmp_path))
        assert lock.acquire(timeout=5)  # kernel dropped the dead flock
        lock.release()

    def test_same_process_reentry_blocked(self, tmp_path):
        lock = FileDistributedLock(str(tmp_path))
        assert lock.acquire()
        other = FileDistributedLock(str(tmp_path))
        assert other.acquire(timeout=0.2) is False
        lock.release()
        assert other.acquire(timeout=2)
        other.release()

    def test_backend_selection_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MARQO_COORDINATION_BACKEND", "file")
        monkeypatch.setenv("MARQO_COORDINATION_DIR", str(tmp_path))
        assert isinstance(get_deployment_lock(), FileDistributedLock)
        monkeypatch.setenv("MARQO_COORDINATION_BACKEND", "in_process")
        assert isinstance(get_deployment_lock(), InProcessDistributedLock)
        # engine without URL falls back with a warning
        monkeypatch.setenv("MARQO_COORDINATION_BACKEND", "engine")
        monkeypatch.delenv("MARQO_COORDINATION_URL", raising=False)
        assert isinstance(get_deployment_lock(), InProcessDistributedLock)


FILE_THROTTLE_HOLDER = """
import sys, time
sys.path.insert(0, {repo!r})
from marqo_tpu.api.throttling import RequestType, _FileBackend
backend = _FileBackend({dir!r})
tokens = [backend.try_acquire(RequestType.SEARCH, {limit}) for _ in range({n})]
assert all(tokens), tokens
print("HELD", flush=True)
time.sleep({hold})
for token in tokens:
    backend.release(RequestType.SEARCH, token)
print("RELEASED", flush=True)
"""


class TestFileThrottle:
    def test_cap_spans_processes(self, tmp_path):
        from marqo_tpu.api.throttling import RequestType, _FileBackend
        proc = _spawn(FILE_THROTTLE_HOLDER.format(
            repo=REPO, dir=str(tmp_path), limit=2, n=2, hold=3.0))
        assert proc.stdout.readline().strip() == "HELD"
        backend = _FileBackend(str(tmp_path))
        assert backend.try_acquire(RequestType.SEARCH, 2) is None  # full
        assert proc.stdout.readline().strip() == "RELEASED"
        token = backend.try_acquire(RequestType.SEARCH, 2)
        assert token is not None
        backend.release(RequestType.SEARCH, token)
        proc.wait(timeout=10)

    def test_dead_pid_slot_reclaimed(self, tmp_path):
        from marqo_tpu.api.throttling import RequestType, _FileBackend
        backend = _FileBackend(str(tmp_path))
        slot_dir = os.path.join(str(tmp_path), "throttle_SEARCH")
        os.makedirs(slot_dir)
        # a slot held by a pid that no longer exists
        with open(os.path.join(slot_dir, "slot_0"), "w") as f:
            f.write("999999999")
        token = backend.try_acquire(RequestType.SEARCH, 1)
        assert token is not None  # reclaimed the stale slot
        backend.release(RequestType.SEARCH, token)


@pytest.fixture(scope="module")
def engine_server():
    server = serve(build_engine_app(StoreEngine()), host="127.0.0.1",
                   port=18450, background=True)
    yield "http://127.0.0.1:18450"
    server.shutdown()


class TestEngineLock:
    def test_mutual_exclusion_and_ttl(self, engine_server):
        lock_a = EngineDistributedLock(engine_server, ttl=1.0)
        lock_b = EngineDistributedLock(engine_server, ttl=1.0)
        assert lock_a.acquire()
        assert lock_b.acquire(timeout=0.2) is False
        lock_a.release()
        assert lock_b.acquire()
        # crashed holder: no release — TTL lets the next owner in
        lock_c = EngineDistributedLock(engine_server, ttl=5.0)
        assert lock_c.acquire(timeout=0.1) is False
        time.sleep(1.1)  # lock_b's 1s TTL expires
        assert lock_c.acquire(timeout=0.2)
        lock_c.release()

    def test_unreachable_backend_fails_closed(self):
        lock = EngineDistributedLock("http://127.0.0.1:1", timeout_s=0.3)
        assert lock.acquire(timeout=0.1) is False


class TestEngineThrottle:
    def test_semaphore_cap_and_release(self, engine_server):
        from marqo_tpu.api.throttling import RequestType, _EngineBackend
        backend = _EngineBackend(engine_server)
        t1 = backend.try_acquire(RequestType.INDEX, 2)
        t2 = backend.try_acquire(RequestType.INDEX, 2)
        assert t1 and t2
        assert backend.try_acquire(RequestType.INDEX, 2) is None
        backend.release(RequestType.INDEX, t1)
        t3 = backend.try_acquire(RequestType.INDEX, 2)
        assert t3 is not None
        backend.release(RequestType.INDEX, t2)
        backend.release(RequestType.INDEX, t3)

    def test_ttl_reclaims_crashed_holder(self, engine_server):
        from marqo_tpu.api.throttling import RequestType, _EngineBackend
        backend = _EngineBackend(engine_server, ttl=0.5)
        assert backend.try_acquire(RequestType.DELETE, 1) is not None
        assert backend.try_acquire(RequestType.DELETE, 1) is None
        time.sleep(0.6)
        token = backend.try_acquire(RequestType.DELETE, 1)
        assert token is not None
        backend.release(RequestType.DELETE, token)

    def test_throttle_decorator_fails_open_on_dead_backend(self, monkeypatch):
        from marqo_tpu.api import throttling
        monkeypatch.setenv("MARQO_COORDINATION_BACKEND", "engine")
        monkeypatch.setenv("MARQO_COORDINATION_URL", "http://127.0.0.1:1")
        throttling.reset_backend()
        calls = []

        @throttling.throttle(throttling.RequestType.SEARCH)
        def handler():
            calls.append(1)
            return "ok"

        try:
            assert handler() == "ok"  # backend dead -> fail open, admitted
            assert calls == [1]
        finally:
            throttling.reset_backend()


DDL_RACE_CODE = """
import os, sys, time
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from marqo_tpu.core.distributed_lock import get_deployment_lock
lock = get_deployment_lock()
# barrier: both processes signal readiness, then attempt together
with open({barrier!r} + "." + str(os.getpid()), "w"):
    pass
deadline = time.monotonic() + 30
import glob
while len(glob.glob({barrier!r} + ".*")) < 2:
    if time.monotonic() > deadline:
        print("BARRIER_TIMEOUT", flush=True); sys.exit(1)
    time.sleep(0.02)
if lock.acquire(timeout=0.2):
    time.sleep(2.0)   # hold through the other process's attempt window
    lock.release()
    print("WON", flush=True)
else:
    print("LOST", flush=True)
"""


class TestBootstrapUnderContention:
    def test_bootstrap_proceeds_when_lock_held_elsewhere(self, tmp_path,
                                                         monkeypatch):
        """A replica starting while another holds the DDL lock must still
        boot (reference config.py:68-81: startup never depends on the
        coordination backend) — observed crashing before the fix."""
        from marqo_tpu.core.index_management.index_management import \
            IndexManagement
        import marqo_tpu.core.index_management.index_management as im_mod
        monkeypatch.setattr(im_mod, "BOOTSTRAP_LOCK_TIMEOUT", 0.2)
        holder = FileDistributedLock(str(tmp_path))
        assert holder.acquire()
        try:
            mgmt = IndexManagement(
                StoreEngine(),
                deployment_lock=FileDistributedLock(str(tmp_path)))
            assert mgmt.bootstrap() in (True, False)  # no raise
        finally:
            holder.release()


class TestTwoProcessDDL:
    def test_concurrent_ddl_serialized_via_file_backend(self, tmp_path):
        """VERDICT done-criterion: two processes contend for the deployment
        lock through env-selected backends; exactly one wins the
        non-blocking acquire."""
        env = {"MARQO_COORDINATION_BACKEND": "file",
               "MARQO_COORDINATION_DIR": str(tmp_path)}
        code = DDL_RACE_CODE.format(repo=REPO,
                                    barrier=str(tmp_path / "ready"))
        procs = [_spawn(code, env), _spawn(code, env)]
        outcomes = sorted(p.stdout.readline().strip() for p in procs)
        for p in procs:
            p.wait(timeout=30)
        assert outcomes == ["LOST", "WON"], outcomes
