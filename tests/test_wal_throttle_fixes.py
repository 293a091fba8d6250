"""Regression tests for the round-5 durability/throttle review findings.

Reference behaviors targeted:
  - Vespa's transactionlog never silently loses acknowledged writes: a
    torn tail from a crash mid-append must not make post-restart appends
    unreachable to replay.
  - The reference throttle FAILS OPEN on ANY limiter error
    (redis_throttle.py:71-75) — including broken configuration.
  - Reference api.py throttles only SEARCH/INDEX/PARTIAL_UPDATE;
    delete-batch is never throttled.
"""

import os
import time

import pytest

from marqo_tpu.engine.wal import WriteAheadLog


class TestWalTornTail:
    def _write_records(self, path, n):
        wal = WriteAheadLog(path)
        for i in range(n):
            wal.append({"op": "feed", "i": i})
        wal.close()

    def test_torn_tail_truncated_on_reopen(self, tmp_path):
        """Crash mid-append leaves a partial frame; records appended after
        a restart must still be replayable (the old code appended them
        BEHIND the garbage, where replay never reaches)."""
        path = str(tmp_path / "wal.log")
        self._write_records(path, 3)
        with open(path, "ab") as f:
            f.write(b"MQWL\xff\xff\xff")  # torn header+payload fragment
        wal = WriteAheadLog(path)  # reopen = the restart
        wal.append({"op": "feed", "i": 99})
        records = list(wal.replay())
        wal.close()
        assert [r["i"] for r in records] == [0, 1, 2, 99]

    def test_garbage_tail_truncated(self, tmp_path):
        path = str(tmp_path / "wal.log")
        self._write_records(path, 2)
        with open(path, "ab") as f:
            f.write(b"NOTMAGIC-garbage")
        wal = WriteAheadLog(path)
        wal.append({"op": "feed", "i": 5})
        assert [r["i"] for r in wal.replay()] == [0, 1, 5]
        wal.close()

    def test_clean_log_untouched(self, tmp_path):
        path = str(tmp_path / "wal.log")
        self._write_records(path, 4)
        size_before = os.path.getsize(path)
        wal = WriteAheadLog(path)
        assert os.path.getsize(path) == size_before
        assert len(list(wal.replay())) == 4
        wal.close()

    def test_rotate_failure_keeps_wal_writable(self, tmp_path, monkeypatch):
        """A failed rotation (disk full mid-copy) must not leave the WAL
        with a closed handle — every subsequent acked write would raise
        'I/O operation on closed file' until the next rotation."""
        path = str(tmp_path / "wal.log")
        wal = WriteAheadLog(path)
        wal.append({"op": "feed", "i": 0})

        def broken_replace(src, dst):
            raise OSError("No space left on device")

        monkeypatch.setattr(os, "replace", broken_replace)
        with pytest.raises(OSError):
            wal.rotate_begin()
        monkeypatch.undo()
        wal.append({"op": "feed", "i": 1})  # must not raise
        assert [r["i"] for r in wal.replay()] == [0, 1]
        wal.close()


class TestThrottleFailOpen:
    def test_malformed_limit_env_admits_traffic(self, monkeypatch):
        """A typo'd MARQO_MAX_CONCURRENT_* must fail OPEN (admit + warn),
        not turn every throttled endpoint into a hard error."""
        from marqo_tpu.api.throttling import RequestType, throttle
        monkeypatch.setenv("MARQO_ENABLE_THROTTLING", "TRUE")
        monkeypatch.setenv("MARQO_MAX_CONCURRENT_SEARCH", "eight")

        @throttle(RequestType.SEARCH)
        def handler():
            return "ok"

        assert handler() == "ok"

    def test_delete_is_not_a_throttled_type(self):
        """Reference api.py throttles only SEARCH/INDEX/PARTIAL_UPDATE:
        DELETE stays in the enum (upstream parity) but has no limit
        mapping, so delete-batch can never 429 on the INDEX cap."""
        from marqo_tpu.api.throttling import _ENV_BY_TYPE, RequestType
        assert RequestType.DELETE not in _ENV_BY_TYPE
        assert set(_ENV_BY_TYPE) == {RequestType.INDEX, RequestType.SEARCH,
                                     RequestType.PARTIAL_UPDATE}


class TestFileBackendSlotRaces:
    def test_fresh_empty_slot_not_stolen(self, tmp_path):
        """An empty slot file is a creator between O_EXCL and write —
        stealing it double-admits and later cross-frees a live slot."""
        from marqo_tpu.api.throttling import RequestType, _FileBackend
        backend = _FileBackend(str(tmp_path))
        slot_dir = backend._slot_dir(RequestType.SEARCH)
        open(os.path.join(slot_dir, "slot_0"), "w").close()  # empty, fresh
        assert backend.try_acquire(RequestType.SEARCH, 1) is None

    def test_old_empty_slot_reclaimed(self, tmp_path):
        """A creator that died between its two syscalls leaves an empty
        file forever; an OLD empty slot must be reclaimable or the
        capacity leaks."""
        from marqo_tpu.api.throttling import RequestType, _FileBackend
        backend = _FileBackend(str(tmp_path))
        slot_dir = backend._slot_dir(RequestType.SEARCH)
        stale = os.path.join(slot_dir, "slot_0")
        open(stale, "w").close()
        past = time.time() - 60
        os.utime(stale, (past, past))
        token = backend.try_acquire(RequestType.SEARCH, 1)
        assert token is not None
        backend.release(RequestType.SEARCH, token)

    def test_dead_pid_slot_reclaimed(self, tmp_path):
        from marqo_tpu.api.throttling import RequestType, _FileBackend
        backend = _FileBackend(str(tmp_path))
        slot_dir = backend._slot_dir(RequestType.SEARCH)
        with open(os.path.join(slot_dir, "slot_0"), "w") as f:
            f.write("999999999")  # beyond pid_max: never alive
        token = backend.try_acquire(RequestType.SEARCH, 1)
        assert token is not None
        backend.release(RequestType.SEARCH, token)


class TestDdlWalOrdering:
    def test_ddl_records_logged_in_apply_order(self, tmp_path):
        """create/delete on the same index name must hit the WAL in apply
        order; replay otherwise resurrects a deleted index. Hammer
        create/delete against concurrent readers of the log order."""
        import threading

        from marqo_tpu.engine.descriptor import IndexDescriptor
        from marqo_tpu.engine.store import StoreEngine
        from marqo_tpu.engine.wal import WriteAheadLog

        engine = StoreEngine()
        wal = WriteAheadLog(str(tmp_path / "wal.log"))
        engine.attach_wal(wal)
        descriptor = IndexDescriptor(name="ddl-race", model_dimensions=4)

        def churn():
            for _ in range(30):
                try:
                    engine.create_index(descriptor)
                except Exception:
                    pass
                try:
                    engine.delete_index("ddl-race")
                except Exception:
                    pass

        threads = [threading.Thread(target=churn) for _ in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        final_exists = engine.has_index("ddl-race")
        wal.close()
        # replay into a fresh engine must converge to the same end state
        replayer = StoreEngine()
        replayer.replay_wal(WriteAheadLog(str(tmp_path / "wal.log")))
        assert replayer.has_index("ddl-race") == final_exists
