"""Host resource watcher: memory/disk utilization + feed-block watermarks.

Role parity: Vespa's cluster-controller resource limits — content nodes
refuse feeds once disk/memory utilization crosses the configured limits
(reference scripts/vespa_local/services.xml resource contract), the feed
client sees HTTP 507, and the API translates it per document (the 507 row
of the vespa_client.py:579-607 matrix, already mirrored in
engine/client.py). /health reflects the same state through
memoryIsAvailable / storageIsAvailable (reference
core/monitoring/monitoring.py:89-154).

Reads are cached for ``ttl_s`` so the per-feed check costs a couple of
dict lookups on the hot ingest path, not a /proc read per document.
"""

import os
import shutil
import threading
import time
from typing import Optional

from marqo_tpu.api import configs


def _read_fraction(var: str, default: float) -> float:
    raw = configs.read_env_vars_and_defaults(var)
    try:
        value = float(raw)
    except (TypeError, ValueError):
        return default
    # watermarks are utilization fractions; tolerate percentage typos
    if value > 1.0:
        value = value / 100.0
    return min(max(value, 0.0), 1.0)


class ResourceWatcher:
    """Cached host memory/disk utilization with feed-block decisions."""

    def __init__(self, ttl_s: float = 1.0, path: str = "/"):
        self.ttl_s = ttl_s
        self.path = path
        self._lock = threading.Lock()
        self._read_at = 0.0
        self._memory_used = 0.0
        self._disk_used = 0.0

    # -- raw utilization (test seams: monkeypatch these) --

    def _probe_memory_used_fraction(self) -> float:
        total = available = 0
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        total = int(line.split()[1])
                    elif line.startswith("MemAvailable:"):
                        available = int(line.split()[1])
                    if total and available:
                        break
        except OSError:
            return 0.0
        if not total:
            return 0.0
        return max(0.0, 1.0 - available / total)

    def _probe_disk_used_fraction(self) -> float:
        try:
            usage = shutil.disk_usage(self.path)
            return usage.used / usage.total if usage.total else 0.0
        except OSError:
            return 0.0

    def _refresh(self) -> None:
        now = time.monotonic()
        with self._lock:
            if now - self._read_at < self.ttl_s:
                return
            self._memory_used = self._probe_memory_used_fraction()
            self._disk_used = self._probe_disk_used_fraction()
            self._read_at = now

    def memory_used_fraction(self) -> float:
        self._refresh()
        return self._memory_used

    def disk_used_fraction(self) -> float:
        self._refresh()
        return self._disk_used

    # -- watermarks (read per call so env/test overrides apply live) --

    @staticmethod
    def memory_watermark() -> float:
        return _read_fraction("MARQO_ENGINE_MEMORY_WATERMARK", 0.95)

    @staticmethod
    def disk_watermark() -> float:
        return _read_fraction("MARQO_ENGINE_DISK_WATERMARK", 0.95)

    def memory_is_available(self) -> bool:
        return self.memory_used_fraction() < self.memory_watermark()

    def storage_is_available(self) -> bool:
        return self.disk_used_fraction() < self.disk_watermark()

    def feed_block_reason(self) -> Optional[str]:
        """Non-None when feeds must be refused (HTTP 507)."""
        if not self.memory_is_available():
            return (f"memory utilization "
                    f"{self.memory_used_fraction():.2f} is above the "
                    f"feed-block watermark {self.memory_watermark():.2f}")
        if not self.storage_is_available():
            return (f"disk utilization {self.disk_used_fraction():.2f} is "
                    f"above the feed-block watermark "
                    f"{self.disk_watermark():.2f}")
        return None


_WATCHER = ResourceWatcher()


def watcher() -> ResourceWatcher:
    return _WATCHER
