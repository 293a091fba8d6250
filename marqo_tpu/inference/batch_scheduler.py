"""Dynamic micro-batching for concurrent embed requests.

The reference's request-level parallelism is thread-per-request with a
fixed torch batch of 16 (SURVEY.md D2); on TPU the economics invert — one
big batch beats many small ones — so concurrent vectorise calls are
coalesced: requests enqueue their texts, a scheduler thread drains the
queue every ``max_wait_ms`` (or immediately at ``max_batch``), runs ONE
bucketed encode, and scatters results back to the waiting requests.

At low QPS a request pays at most ``max_wait_ms`` extra; at high QPS the
queue always has work and the TPU sees dense batches (query p50 stays low
because the wait never exceeds the knob).
"""

import threading
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class SchedulerShutdown(RuntimeError):
    """The scheduler was shut down (model eject) with requests in flight."""


class _Pending:
    __slots__ = ("contents", "event", "result", "error")

    def __init__(self, contents: List[Any]):
        self.contents = contents
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None


class BatchScheduler:
    """Coalesces encode requests for ONE model instance.

    encode_fn: List[content] -> np.ndarray (n, dims)
    """

    def __init__(self, encode_fn: Callable[[List[Any]], np.ndarray],
                 max_batch: int = 256, max_wait_ms: float = 2.0):
        self._encode_fn = encode_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: List[_Pending] = []
        self._queued_items = 0
        self._lock = threading.Lock()
        self._wakeup = threading.Event()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="embed-batch-scheduler")
        self._thread.start()

    def encode(self, contents: List[Any],
               timeout: float = 60.0) -> np.ndarray:
        """Blocking: enqueue and wait for the scheduler to process."""
        pending = _Pending(list(contents))
        with self._lock:
            if self._stop.is_set():
                # model ejected between lookup and enqueue — the caller
                # (vectorise) re-resolves a scheduler rather than hanging
                # the full timeout on a queue nobody will drain
                raise SchedulerShutdown("Batch scheduler was shut down")
            self._queue.append(pending)
            self._queued_items += len(pending.contents)
            fire_now = self._queued_items >= self.max_batch
        if fire_now:
            self._wakeup.set()
        if not pending.event.wait(timeout):
            raise TimeoutError("Batched encode timed out")
        if pending.error is not None:
            raise pending.error
        return pending.result

    def _loop(self):
        while not self._stop.is_set():
            self._wakeup.wait(self.max_wait_s)
            self._wakeup.clear()
            with self._lock:
                batch = self._queue
                self._queue = []
                self._queued_items = 0
            if not batch:
                continue
            contents: List[Any] = []
            spans: List[Tuple[_Pending, int, int]] = []
            for pending in batch:
                start = len(contents)
                contents.extend(pending.contents)
                spans.append((pending, start, len(pending.contents)))
            try:
                results = self._encode_fn(contents)
                for pending, start, count in spans:
                    pending.result = results[start:start + count]
                    pending.event.set()
            except Exception as e:  # propagate to every waiter
                for pending, _s, _c in spans:
                    pending.error = e
                    pending.event.set()

    def shutdown(self):
        self._stop.set()
        self._wakeup.set()
        self._thread.join(timeout=2)
        # fail any waiter whose batch was never drained (enqueued before
        # the stop flag landed) — otherwise each hangs its full timeout
        with self._lock:
            stranded = self._queue
            self._queue = []
            self._queued_items = 0
        for pending in stranded:
            pending.error = SchedulerShutdown(
                "Batch scheduler was shut down")
            pending.event.set()


_schedulers: Dict[str, BatchScheduler] = {}
_schedulers_lock = threading.Lock()


def get_scheduler(key: str, encode_fn, max_batch: int = 256,
                  max_wait_ms: float = 2.0) -> BatchScheduler:
    with _schedulers_lock:
        if key not in _schedulers:
            _schedulers[key] = BatchScheduler(encode_fn, max_batch,
                                              max_wait_ms)
        return _schedulers[key]


def clear_scheduler(key: str) -> None:
    """Shut down and drop the scheduler for one model cache key. Must be
    called when that model is ejected/evicted — the scheduler's encode_fn
    closure holds the model object, so a live scheduler keeps an evicted
    model (and its device memory) alive and serving."""
    with _schedulers_lock:
        scheduler = _schedulers.pop(key, None)
    if scheduler is not None:
        scheduler.shutdown()


def clear_schedulers() -> None:
    with _schedulers_lock:
        for scheduler in _schedulers.values():
            scheduler.shutdown()
        _schedulers.clear()
