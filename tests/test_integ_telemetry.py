"""Ported reference tests: telemetry (Timer, RequestMetricsStore,
middleware injection).

Source: /root/reference/tests/tensor_search/test_telemetry.py — Timer
start/stop/restart in ms with double-start warning and TimerError on
unstarted stop; RequestMetrics time()/start()/stop()/increment_counter
and json() (always both keys); stop-without-start warning message; the
middleware injecting a pruned ``telemetry`` block only when
``?telemetry=true`` and the body is a dict. Our store is thread-local
(one request per thread) rather than Request-keyed, so set/clear take no
request argument.
"""

import json
import logging
import urllib.request
from unittest.mock import patch

import pytest

from marqo_tpu.api.telemetry import (RequestMetrics, RequestMetricsStore,
                                     Timer, TimerError)


@pytest.fixture(autouse=True)
def fresh_store():
    RequestMetricsStore.set_in_request()
    yield
    RequestMetricsStore.clear()


@pytest.fixture(autouse=True)
def propagate_logs():
    """Our loggers set propagate=False (own handler); let caplog see
    telemetry warnings for these message-parity assertions."""
    root = logging.getLogger("marqo_tpu")
    old = root.propagate
    root.propagate = True
    yield
    root.propagate = old


class TestTimer:
    @patch("time.perf_counter")
    def test_timer_start_stop(self, mock_time, caplog):
        mock_time.side_effect = [0.0, 1.0]
        timer = Timer()
        timer.start()
        assert timer.start_time == 0.0

        with caplog.at_level(logging.WARNING):
            timer.start()
        assert "'.start()' called on already running timer." in caplog.text

        assert timer.stop() == 1000.0  # ms
        assert timer.start_time is None
        with pytest.raises(TimerError):
            timer.stop()

    @patch("time.perf_counter")
    def test_timer_restart(self, mock_time):
        mock_time.side_effect = [0.0, 1.0, 2.0, 4.0]
        timer = Timer()
        timer.start()
        assert timer.stop() == 1000.0
        timer.start()
        assert timer.stop() == 2000.0


class TestRequestMetricsStore:
    def test_set_in_request_and_for_request(self):
        metrics = RequestMetricsStore.set_in_request()
        assert RequestMetricsStore.for_request() is metrics

    def test_clear(self):
        before = RequestMetricsStore.for_request()
        RequestMetricsStore.clear()
        assert RequestMetricsStore.for_request() is not before

    def test_time_context_manager(self):
        metric = RequestMetricsStore.for_request()
        with metric.time("timer1"):
            pass
        data = metric.json()
        assert set(data) == {"counter", "timesMs"}
        assert data["counter"] == {}
        assert "timer1" in data["timesMs"]

    def test_time_with_exception_still_records(self):
        metric = RequestMetricsStore.for_request()
        with pytest.raises(Exception, match="Test exception"):
            with metric.time("timer1"):
                raise Exception("Test exception")
        assert "timer1" in metric.json()["timesMs"]

    def test_start_stop_success(self):
        metric = RequestMetricsStore.for_request()
        metric.start("timer1")
        elapsed = metric.stop("timer1")
        assert elapsed is not None and elapsed >= 0
        assert metric.json()["timesMs"]["timer1"] == pytest.approx(elapsed)

    def test_stop_without_start_warns(self, caplog):
        metric = RequestMetricsStore.for_request()
        with caplog.at_level(logging.WARNING):
            assert metric.stop("timer1") is None
        assert ("timer timer1 stopped incorrectly. Time not recorded."
                in caplog.text)
        assert metric.json()["timesMs"] == {}

    def test_increment_counter_with_value(self):
        metric = RequestMetricsStore.for_request()
        metric.increment_counter("counter1", 5)
        assert metric.counters == {"counter1": 5}

    def test_increment_counter_multiple_times(self):
        metric = RequestMetricsStore.for_request()
        metric.increment_counter("counter1")
        metric.increment_counter("counter1")
        assert metric.counters == {"counter1": 2}

    def test_increment_counter_and_json(self):
        metric = RequestMetricsStore.for_request()
        metric.increment_counter("key1")
        metric.times["key1"] = 1.0
        assert metric.json() == {"counter": {"key1": 1},
                                 "timesMs": {"key1": 1.0}}

    def test_json_always_has_both_keys(self):
        assert RequestMetrics().json() == {"counter": {}, "timesMs": {}}


class TestTelemetryMiddleware:
    """Injection behavior through our HTTP framework (in-process server)."""

    @pytest.fixture(scope="class")
    def server(self):
        from marqo_tpu.api.http_framework import App, Response, serve
        router = App()

        def plain(request):
            return {"data": "test"}

        def with_counter(request):
            RequestMetricsStore.for_request().increment_counter("key")
            return {"data": "test"}

        def with_timing(request):
            m = RequestMetricsStore.for_request()
            m.start("key")
            m.stop("key")
            return {"data": "test"}

        def with_time_cm(request):
            with RequestMetricsStore.for_request().time("key"):
                pass
            return {"data": "test"}

        def not_a_dict(request):
            return Response(200, ["not", "a", "dict"])

        router.add_route("GET", "/", plain)
        router.add_route("GET", "/counter", with_counter)
        router.add_route("GET", "/timing", with_timing)
        router.add_route("GET", "/time-cm", with_time_cm)
        router.add_route("GET", "/list", not_a_dict)
        srv = serve(router, host="127.0.0.1", port=0, background=True)
        yield srv.server_address[1]
        srv.shutdown()

    def _get(self, port, path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}") as resp:
            return json.load(resp)

    def test_telemetry_disabled(self, server):
        assert "telemetry" not in self._get(server, "/")
        assert "telemetry" not in self._get(server, "/?telemetry=false")

    def test_telemetry_enabled(self, server):
        assert "telemetry" in self._get(server, "/?telemetry=true")

    def test_counter_usage_prunes_empty_counter_elsewhere(self, server):
        # divergence (PARITY.md): our dispatcher always times
        # "wholeRequest", so timesMs is never empty in served responses;
        # counter still prunes when empty.
        body = self._get(server, "/counter?telemetry=true")
        assert body["telemetry"]["counter"] == {"key": 1}
        plain = self._get(server, "/?telemetry=true")
        assert "counter" not in plain["telemetry"]

    def test_timing_usage(self, server):
        body = self._get(server, "/timing?telemetry=true")
        assert "key" in body["telemetry"]["timesMs"]
        assert "counter" not in body["telemetry"]

    def test_with_time_context_manager(self, server):
        body = self._get(server, "/time-cm?telemetry=true")
        assert "key" in body["telemetry"]["timesMs"]

    def test_non_dict_body_not_injected(self, server):
        body = self._get(server, "/list?telemetry=true")
        assert body == ["not", "a", "dict"]

    def test_metrics_cleared_between_requests(self, server):
        self._get(server, "/counter?telemetry=true")
        body = self._get(server, "/counter?telemetry=true")
        # a fresh store per request: counter restarts at 1
        assert body["telemetry"]["counter"] == {"key": 1}
