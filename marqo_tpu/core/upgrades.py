"""Versioned upgrade / rollback runners.

Parity: reference src/marqo/upgrades/upgrade.py:31-100 — an UpgradeRunner
that selects a migration by (from_version, to_version) and applies it, and
a RollbackRunner for the reverse; plus the app-level settings
bootstrap/rollback that lives in the settings store
(core/index_management/settings_store.py, history + rollback).

The 2.13-era reference migrates Vespa app-package layouts; our durable
state is the versioned settings store, so migrations transform persisted
index-settings documents.
"""

from typing import Callable, Dict, Tuple

from marqo_tpu.core.exceptions import InternalError
from marqo_tpu.logging import get_logger
from marqo_tpu.version import __version__

logger = get_logger(__name__)

# (from_minor, to_minor) -> migration callable(settings_doc) -> settings_doc
Migration = Callable[[dict], dict]
_MIGRATIONS: Dict[Tuple[str, str], Migration] = {}


def register_migration(from_version: str, to_version: str):
    def decorator(fn: Migration) -> Migration:
        _MIGRATIONS[(from_version, to_version)] = fn
        return fn

    return decorator


def _minor(version: str) -> str:
    return ".".join(version.split("+")[0].split(".")[:2])


@register_migration("2.12", "2.13")
def _migrate_2_12_to_2_13(settings: dict) -> dict:
    """2.13 settings migration: default the video/audio preprocessing
    blocks introduced in 2.13 (reference index-settings evolution) and
    re-stamp the per-index marqo_version marker, as the reference's
    upgrade rewrites index settings under the new app-package version."""
    settings = dict(settings)
    settings.setdefault("video_preprocessing", None)
    settings.setdefault("audio_preprocessing", None)
    if _minor(settings.get("marqo_version") or "") == "2.12":
        settings["marqo_version"] = __version__
    return settings


def find_migration_path(from_version: str, to_version: str):
    """Compose registered single-step migrations into a multi-hop path
    (2.12→2.14 = 2.12→2.13 then 2.13→2.14); BFS over the registered edges
    so the shortest chain wins — the reference runner likewise selects a
    per-version path (upgrades/upgrade.py:50). Returns an ordered list of
    migration callables, or None when no path exists."""
    from collections import deque
    queue = deque([(from_version, [])])
    seen = {from_version}
    while queue:
        current, path = queue.popleft()
        if current == to_version:
            return path
        for (src, dst), fn in _MIGRATIONS.items():
            if src == current and dst not in seen:
                seen.add(dst)
                queue.append((dst, path + [fn]))
    return None


class UpgradeRunner:
    """Applies pending migrations to every persisted index-settings doc
    (reference UpgradeRunner._for_version, upgrade.py:50)."""

    def __init__(self, index_management):
        self.index_management = index_management

    def upgrade(self) -> dict:
        store = self.index_management.settings_store
        from_version = _minor(store.get_marqo_version())
        to_version = _minor(__version__)
        if from_version == to_version:
            return {"from": from_version, "to": to_version, "migrated": 0}
        path = find_migration_path(from_version, to_version)
        if path is None:
            raise InternalError(
                f"No upgrade path registered from {from_version} to "
                f"{to_version}")

        def migration(doc: dict) -> dict:
            for step in path:
                doc = step(doc)
            return doc
        # snapshot the whole application before mutating, so
        # /rollback-vespa's equivalent can undo a bad upgrade (reference
        # backs up the Vespa app package before deploying the new one,
        # vespa_application_package.py:259-335)
        store.backup_application()
        count = 0
        for index in self.index_management.get_all_indexes():
            import json
            doc = json.loads(index.model_dump_json())
            migrated = migration(doc)
            if migrated != doc:
                # the store enforces optimistic versioning: a rewrite
                # must carry current version + 1
                migrated["version"] = (doc.get("version") or 1) + 1
                from marqo_tpu.core.models.marqo_index import MarqoIndex
                store.save(MarqoIndex.parse_obj(migrated),
                           allow_existing=True)
                count += 1
        store.set_marqo_version(__version__)
        logger.info(f"Upgraded settings {from_version} -> {to_version} "
                    f"({count} indexes migrated)")
        return {"from": from_version, "to": to_version, "migrated": count}


class RollbackRunner:
    """Restores the previous settings version of an index
    (reference rollback runners + VespaAppBackup semantics)."""

    def __init__(self, index_management):
        self.index_management = index_management

    def rollback_index(self, index_name: str) -> dict:
        index = self.index_management.rollback_index(index_name)
        return {"index": index.name, "version": index.version}
