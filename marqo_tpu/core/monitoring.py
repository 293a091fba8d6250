"""Health, stats and device info.

Parity: reference src/marqo/core/monitoring/monitoring.py — health
aggregation (:89-154), index stats doc/vector counts (:27-74), device info
(:156-186, CUDA→TPU here).
"""

import os
import shutil
from typing import Optional

from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.core.exceptions import IndexNotFoundError


class Monitoring:
    def __init__(self, config):
        self.config = config

    _STATUS_RANK = {"green": 0, "yellow": 1, "red": 2}

    def get_health(self, index_name: Optional[str] = None) -> dict:
        """Aggregate REAL backend state (reference monitoring.py:89-154:
        per-service Vespa status + feed-block metrics): engine reachability
        (per shard/replica for a cluster) and host feed-block watermarks.
        Overall status is the worst of inference and backend."""
        if index_name is not None:
            try:
                self.config.index_meta_cache.get_index(index_name)
            except IndexNotFoundError:
                raise api_exceptions.IndexNotFoundError(
                    f"Index {index_name} not found")
        probe = getattr(self.config.engine, "engine_health", None)
        nodes = []
        if callable(probe):
            try:
                report = probe()
                backend_status = report.get("status", "red")
                nodes = report.get("nodes") or []
            except Exception:
                backend_status = "red"
        else:
            backend_status = "green"
        if nodes:
            # resource flags come from the CONTENT NODES' own watchers
            # (remote/cluster: each /engine/health body; in-process: this
            # host) — the API host's local memory pressure is not the
            # backend's, and a remote node's feed-block must not be masked
            # by a healthy API host (reference monitoring.py:89-154
            # aggregates content-node feed-block metrics)
            memory_available = all(
                n.get("memoryIsAvailable", True) for n in nodes)
            storage_is_available = all(
                n.get("storageIsAvailable", True) for n in nodes)
        else:
            from marqo_tpu.engine.resources import watcher
            w = watcher()
            memory_available = w.memory_is_available()
            storage_is_available = w.storage_is_available()
        if backend_status == "green" and not (memory_available and
                                              storage_is_available):
            backend_status = "yellow"  # reachable but feed-blocked
        inference_status = "green"
        overall = max(backend_status, inference_status,
                      key=lambda s: self._STATUS_RANK.get(s, 2))
        return {
            "status": overall,
            "inference": {"status": inference_status},
            "backend": {
                "status": backend_status,
                "memoryIsAvailable": memory_available,
                "storageIsAvailable": storage_is_available,
            },
        }

    def get_index_stats(self, index_name: str) -> dict:
        from marqo_tpu.engine.resources import watcher
        index = self.config.index_meta_cache.get_index(index_name)
        return {
            "numberOfDocuments": self.config.engine.doc_count(index.schema_name),
            "numberOfVectors": self.config.engine.vector_count(index.schema_name),
            "backend": {
                # real host memory utilization (reference pulls content-node
                # memory util from Vespa metrics, monitoring.py:27-74)
                "memoryUsedPercentage": round(
                    100.0 * watcher().memory_used_fraction(), 2),
                "storageUsedPercentage": self._storage_used_percentage(),
            },
        }

    @staticmethod
    def _storage_used_percentage() -> float:
        try:
            usage = shutil.disk_usage("/")
            return round(100.0 * usage.used / usage.total, 2)
        except OSError:
            return 0.0

    @staticmethod
    def get_cpu_info() -> dict:
        try:
            load1, load5, load15 = os.getloadavg()
        except OSError:
            load1 = load5 = load15 = 0.0
        mem_total = mem_available = 0
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        mem_total = int(line.split()[1]) * 1024
                    elif line.startswith("MemAvailable:"):
                        mem_available = int(line.split()[1]) * 1024
        except OSError:
            pass
        used_pct = (round(100.0 * (mem_total - mem_available) / mem_total, 2)
                    if mem_total else 0.0)
        return {
            "cpu_usage_percent": f"{load1:.1f}",
            "memory_used_percent": f"{used_pct}",
            "memory_used_gb": f"{(mem_total - mem_available) / 1024 ** 3:.1f}",
        }

    @staticmethod
    def get_accelerator_info() -> dict:
        """TPU devices in the reference's cuda-info response shape
        (monitoring.py:156-186; 'cuda' naming kept for API parity)."""
        import jax
        devices = []
        try:
            for d in jax.devices():
                if d.platform == "cpu":
                    continue
                devices.append({
                    "device_id": d.id,
                    "device_name": str(d.device_kind),
                    "memory_used": None,
                    "total_memory": None,
                    "utilization": None,
                })
        except Exception:
            pass
        if not devices:
            raise api_exceptions.BadRequestError(
                "No accelerator (TPU) devices available in this Marqo "
                "instance")
        return {"cuda_devices": devices}
