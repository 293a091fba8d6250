"""Request-scoped telemetry: named timers + counters, opt-in per request.

Parity: reference src/marqo/tensor_search/telemetry.py —
RequestMetricsStore with time()/start()/stop()/increment_counter (:48-117),
per-request registration keyed by request object (:119-152), and the
middleware that injects a ``telemetry`` block into the response JSON when
the request has ``?telemetry=true`` (:154-218). Thread-local here instead
of a Request-keyed dict: our framework dispatches one request per thread.
"""

import threading
import time
from contextlib import contextmanager
from typing import Dict, Optional

from marqo_tpu.logging import get_logger

logger = get_logger(__name__)


class TimerError(Exception):
    """Raised when a Timer is stopped without having been started
    (reference telemetry.py Timer.stop)."""


class Timer:
    """Millisecond stopwatch (reference telemetry.py Timer): ``start()``
    warns if already running, ``stop()`` raises :class:`TimerError` if not
    running and returns the elapsed time in ms."""

    def __init__(self):
        self.start_time: Optional[float] = None

    def start(self) -> None:
        if self.start_time is not None:
            logger.warning("'.start()' called on already running timer.")
        else:
            self.start_time = time.perf_counter()

    def stop(self) -> float:
        if self.start_time is None:
            raise TimerError("'.stop()' called on unstarted timer.")
        elapsed = (time.perf_counter() - self.start_time) * 1000
        self.start_time = None
        return elapsed


class RequestMetrics:
    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counters: Dict[str, int] = {}
        self._starts: Dict[str, float] = {}

    @contextmanager
    def time(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> Optional[float]:
        started = self._starts.pop(name, None)
        if started is None:
            # reference telemetry.py: "timer {k} stopped incorrectly. ..."
            logger.warning(
                f"timer {name} stopped incorrectly. Time not recorded.")
            return None
        elapsed_ms = (time.perf_counter() - started) * 1000
        self.times[name] = self.times.get(name, 0.0) + elapsed_ms
        return elapsed_ms

    def add_time(self, name: str, value_ms: float) -> None:
        self.times[name] = self.times.get(name, 0.0) + value_ms

    def increment_counter(self, name: str, value: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + value

    def json(self) -> dict:
        # Both keys always present (reference RequestMetrics.json()).
        return {"counter": dict(self.counters),
                "timesMs": dict(self.times)}


class RequestMetricsStore:
    """Thread-scoped registry of the in-flight request's metrics."""

    _local = threading.local()

    @classmethod
    def for_request(cls) -> RequestMetrics:
        metrics = getattr(cls._local, "metrics", None)
        if metrics is None:
            metrics = RequestMetrics()
            cls._local.metrics = metrics
        return metrics

    @classmethod
    def set_in_request(cls) -> RequestMetrics:
        cls._local.metrics = RequestMetrics()
        return cls._local.metrics

    @classmethod
    def clear(cls) -> None:
        cls._local.metrics = None

    @classmethod
    def merge(cls, other: RequestMetrics) -> None:
        """Merge metrics gathered on a worker thread into the request's
        (reference reduce_thread_metrics, add_docs.py:384)."""
        metrics = cls.for_request()
        for name, value in other.times.items():
            metrics.add_time(name, value)
        for name, value in other.counters.items():
            metrics.increment_counter(name, value)
