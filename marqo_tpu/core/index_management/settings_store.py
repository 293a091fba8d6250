"""Durable index-settings store with version history and rollback.

Parity: reference vespa_application_package.py — IndexSettingStore with
history (:140-236), MarqoConfigStore (:237), backup + rollback (:259-335,
:612). Settings persist as JSON under MARQO_ENGINE_DATA_DIR (one file per
index + a history file); with no data dir the store is in-memory (tests,
ephemeral deployments).
"""

import json
import os
import threading
from typing import Dict, List, Optional

from marqo_tpu.core.exceptions import (ApplicationNotInitializedError,
                                       IndexExistsError, IndexNotFoundError)
from marqo_tpu.core.models.marqo_index import MarqoIndex
from marqo_tpu.logging import get_logger
from marqo_tpu.version import __version__

logger = get_logger(__name__)

_HISTORY_LIMIT = 3  # settings versions kept per index (reference keeps 3)


class IndexSettingsStore:
    # reads re-check the disk at most this often (multi-worker visibility)
    RELOAD_INTERVAL_S = 1.0

    def __init__(self, data_dir: Optional[str] = None):
        self._data_dir = data_dir
        self._settings: Dict[str, dict] = {}
        self._history: Dict[str, List[dict]] = {}
        self._config: Optional[dict] = None
        self._lock = threading.RLock()
        self._disk_fingerprint = None
        self._last_reload_check = 0.0
        if data_dir:
            os.makedirs(os.path.join(data_dir, "index_settings"), exist_ok=True)
            self._load_from_disk()

    def _fingerprint(self):
        settings_dir = os.path.join(self._data_dir, "index_settings")
        entries = []
        try:
            for fname in sorted(os.listdir(settings_dir)):
                try:
                    stat = os.stat(os.path.join(settings_dir, fname))
                    # mtime_ns + size: same-second rewrites still differ
                    entries.append((fname, stat.st_mtime_ns, stat.st_size))
                except OSError:
                    pass
        except OSError:
            pass
        return tuple(entries)

    def _maybe_reload(self) -> None:
        """Pick up settings written by OTHER API worker processes sharing
        the data dir (multi-worker serving: DDL lands on one worker; the
        others must see the new index within ~1s, like the reference's
        index-cache refresh against the shared Vespa store)."""
        if not self._data_dir:
            return
        import time
        now = time.monotonic()
        if now - self._last_reload_check < self.RELOAD_INTERVAL_S:
            return
        with self._lock:
            if now - self._last_reload_check < self.RELOAD_INTERVAL_S:
                return
            self._last_reload_check = now
            fingerprint = self._fingerprint()
            if fingerprint != self._disk_fingerprint:
                self._settings.clear()
                self._history.clear()
                self._load_from_disk()

    # -- bootstrap / config -------------------------------------------------

    def bootstrap(self) -> bool:
        """Initialize the store; returns True if first-time bootstrap
        (reference bootstrap_vespa version gate, index_management.py:82-105)."""
        with self._lock:
            if self._config is not None:
                return False
            self._config = {"version": __version__}
            self._persist_config()
            return True

    def is_initialized(self) -> bool:
        return self._config is not None

    def get_marqo_version(self) -> str:
        if self._config is None:
            raise ApplicationNotInitializedError(
                "Settings store has not been bootstrapped")
        return self._config["version"]

    def set_marqo_version(self, version: str) -> None:
        with self._lock:
            self._config = {"version": version}
            self._persist_config()

    # -- CRUD ---------------------------------------------------------------

    def save(self, index: MarqoIndex, allow_existing: bool = False) -> None:
        """Optimistic-concurrency save (reference IndexSettingStore
        .save_index_setting, index_setting_store.py): a new index stamps
        version 1 (an explicit version > 1 conflicts — "does not exist or
        has been deleted"); an update must carry exactly
        current version + 1."""
        from marqo_tpu.core.exceptions import OperationConflictError
        with self._lock:
            name = index.name
            if name in self._settings and not allow_existing:
                raise IndexExistsError(f"Index {name} already exists")
            doc = json.loads(index.model_dump_json())
            if name in self._settings:
                current = self._settings[name].get("version") or 1
                target = doc.get("version")
                if target is None:
                    doc["version"] = current + 1
                elif target != current + 1:
                    raise OperationConflictError(
                        f"Editing index settings failed due to version "
                        f"conflict. Current version is {current}, and "
                        f"cannot be upgraded to target version {target}")
                history = self._history.setdefault(name, [])
                history.insert(0, self._settings[name])
                del history[_HISTORY_LIMIT:]
            else:
                target = doc.get("version")
                if target is None:
                    doc["version"] = 1
                elif target > 1:
                    raise OperationConflictError(
                        f"Editing index settings failed due to version "
                        f"conflict. The index does not exist or has been "
                        f"deleted, and target version {target} is not 1")
            self._settings[name] = doc
            self._persist_index(name)
            if self._data_dir:
                self._disk_fingerprint = self._fingerprint()

    def get(self, name: str) -> MarqoIndex:
        self._maybe_reload()
        with self._lock:
            if name not in self._settings:
                raise IndexNotFoundError(f"Index {name} not found")
            return MarqoIndex.parse_obj(self._settings[name])

    def contains(self, name: str) -> bool:
        self._maybe_reload()
        return name in self._settings

    def get_all(self) -> List[MarqoIndex]:
        self._maybe_reload()
        with self._lock:
            return [MarqoIndex.parse_obj(doc)
                    for doc in self._settings.values()]

    def delete(self, name: str) -> None:
        with self._lock:
            if name not in self._settings:
                raise IndexNotFoundError(f"Index {name} not found")
            history = self._history.setdefault(name, [])
            history.insert(0, self._settings.pop(name))
            del history[_HISTORY_LIMIT:]
            self._persist_index(name)
            if self._data_dir:
                self._disk_fingerprint = self._fingerprint()

    def rollback(self, name: str) -> MarqoIndex:
        """Restore the previous settings version for an index."""
        with self._lock:
            history = self._history.get(name) or []
            if not history:
                from marqo_tpu.core.exceptions import ApplicationRollbackError
                raise ApplicationRollbackError(
                    f"No settings history for index {name}")
            self._settings[name] = history.pop(0)
            self._persist_index(name)
            if self._data_dir:
                self._disk_fingerprint = self._fingerprint()
            return MarqoIndex.parse_obj(self._settings[name])

    def get_history(self, name: str) -> List[dict]:
        return list(self._history.get(name, []))

    # -- application-wide backup / restore ----------------------------------
    # Reference: vespa_application_package.py VespaAppBackup (:259-335) — a
    # full app-package snapshot taken before an upgrade mutates it, restored
    # by POST /rollback-vespa (api.py:509). Our app package is the settings
    # store, so the backup is config + every settings doc + history.

    def backup_application(self) -> None:
        """Snapshot the whole store (config + settings + history)."""
        with self._lock:
            self._backup = {
                "config": dict(self._config) if self._config else None,
                "settings": {k: json.loads(json.dumps(v))
                             for k, v in self._settings.items()},
                "history": {k: json.loads(json.dumps(v))
                            for k, v in self._history.items()},
            }
            if self._data_dir:
                path = os.path.join(self._data_dir, "marqo_backup.json")
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(self._backup, f)
                os.replace(tmp, path)

    def restore_application_backup(self) -> None:
        """Restore the last backup_application() snapshot
        (reference rollback_vespa, index_management.py + api.py:509)."""
        with self._lock:
            backup = getattr(self, "_backup", None)
            if backup is None and self._data_dir:
                path = os.path.join(self._data_dir, "marqo_backup.json")
                if os.path.exists(path):
                    with open(path) as f:
                        backup = json.load(f)
            if backup is None:
                from marqo_tpu.core.exceptions import ApplicationRollbackError
                raise ApplicationRollbackError(
                    "No application backup exists to roll back to")
            old_names = set(self._settings)
            self._config = backup["config"]
            self._settings = {k: dict(v)
                              for k, v in backup["settings"].items()}
            self._history = {k: list(v)
                             for k, v in backup["history"].items()}
            self._persist_config()
            for name in old_names | set(self._settings):
                self._persist_index(name)
            if self._data_dir:
                self._disk_fingerprint = self._fingerprint()

    # -- persistence ---------------------------------------------------------

    def _index_path(self, name: str) -> str:
        return os.path.join(self._data_dir, "index_settings", f"{name}.json")

    def _persist_index(self, name: str) -> None:
        if not self._data_dir:
            return
        path = self._index_path(name)
        if name in self._settings:
            payload = {"settings": self._settings[name],
                       "history": self._history.get(name, [])}
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, path)
        elif os.path.exists(path):
            os.remove(path)

    def _persist_config(self) -> None:
        if not self._data_dir or self._config is None:
            return
        path = os.path.join(self._data_dir, "marqo_config.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._config, f)
        os.replace(tmp, path)

    def _load_from_disk(self) -> None:
        config_path = os.path.join(self._data_dir, "marqo_config.json")
        if os.path.exists(config_path):
            with open(config_path) as f:
                self._config = json.load(f)
        settings_dir = os.path.join(self._data_dir, "index_settings")
        for fname in os.listdir(settings_dir):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(settings_dir, fname)) as f:
                payload = json.load(f)
            name = fname[:-len(".json")]
            self._settings[name] = payload["settings"]
            self._history[name] = payload.get("history", [])
        self._disk_fingerprint = self._fingerprint()
        if self._settings:
            logger.info(f"Loaded {len(self._settings)} index settings from disk")
