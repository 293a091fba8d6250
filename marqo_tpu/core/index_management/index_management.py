"""Index DDL: bootstrap, create/batch-create, delete, update, rollback.

Parity: reference core/index_management/index_management.py:29-363 — DDL
under a deployment lock, version-gated bootstrap, schema generation via the
descriptor factory, semi-structured update, engine deployment.
"""

from typing import List, Optional

from marqo_tpu.core import exceptions as core_exceptions
from marqo_tpu.core.distributed_lock import (AbstractDistributedLock,
                                             get_deployment_lock)
from marqo_tpu.core.index_management.settings_store import IndexSettingsStore
from marqo_tpu.core.models.marqo_index import (MarqoIndex,
                                               SemiStructuredMarqoIndex)
from marqo_tpu.engine.descriptor import descriptor_from_marqo_index
from marqo_tpu.engine.store import StoreEngine
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)

BOOTSTRAP_LOCK_TIMEOUT = 15.0  # bounded wait at startup; never blocks boot


def _deployment_lock_timeout() -> float:
    """DDL lock acquire timeout, seconds. Reference api/configs.py:54
    defaults MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT to 5 and config.py:46
    reads it per-process."""
    import os
    raw = os.environ.get("MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT", "")
    try:
        value = float(raw) if raw else 5.0
    except ValueError:
        # the reference fails loudly on unparseable int env vars
        # (config.py:46 read_env_vars_and_defaults_ints); we stay available
        # but make the operator typo visible instead of silently ignoring it
        logger.warning(
            f"MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT={raw!r} is not a number; "
            f"using default 5.0s")
        return 5.0
    if value < 0:
        logger.warning(
            f"MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT={raw!r} is negative; "
            f"clamping to 0 (non-blocking acquire)")
        return 0.0
    return value


class IndexManagement:
    def __init__(self, engine: StoreEngine,
                 settings_store: Optional[IndexSettingsStore] = None,
                 deployment_lock: Optional[AbstractDistributedLock] = None):
        self._engine = engine
        self._store = settings_store or IndexSettingsStore()
        self._lock = deployment_lock or get_deployment_lock()

    @property
    def settings_store(self) -> IndexSettingsStore:
        return self._store

    @classmethod
    def validate_index_settings(cls, index_name: str,
                                settings_dict: dict) -> None:
        """Validate a settings dict without creating anything (reference
        index_management.py:62-80: parse IndexSettings, then build the
        index request; raises pydantic ValidationError / InvalidArgError,
        returns None when valid)."""
        from marqo_tpu.api.models.index_settings import IndexSettings
        index_settings = IndexSettings(**settings_dict)
        index_settings.to_marqo_index(index_name)

    def bootstrap(self) -> bool:
        """Initialize the settings store and re-deploy persisted indexes
        into the engine (reference bootstrap_vespa). A held cross-replica
        lock must NOT crash startup (reference config.py:68-81: Marqo still
        starts when the coordination backend is unavailable — only DDL
        degrades): wait a bounded time, then warn and proceed, since the
        shared settings store makes bootstrap idempotent across replicas."""
        acquired = self._lock.acquire(timeout=BOOTSTRAP_LOCK_TIMEOUT)
        if not acquired:
            logger.warning(
                "Deployment lock held by another replica during bootstrap; "
                "proceeding without it (bootstrap is idempotent)")
        try:
            first_time = self._store.bootstrap()
            for index in self._store.get_all():
                if not self._engine.has_index(index.schema_name):
                    self._engine.create_index(descriptor_from_marqo_index(index))
            return first_time
        finally:
            if acquired:
                self._lock.release()

    def _ddl_lock(self):
        return self._lock.context(
            timeout=_deployment_lock_timeout(),
            failure_message="Another index creation/deletion operation is in "
                            "progress. Your request is rejected. Please try "
                            "again later")

    def create_index(self, index: MarqoIndex) -> MarqoIndex:
        return self.batch_create_indexes([index])[0]

    def batch_create_indexes(self, indexes: List[MarqoIndex]) -> List[MarqoIndex]:
        with self._ddl_lock():
            for index in indexes:
                if self._store.contains(index.name):
                    raise core_exceptions.IndexExistsError(
                        f"Index {index.name} already exists")
            for index in indexes:
                self._store.save(index)
                try:
                    self._engine.create_index(
                        descriptor_from_marqo_index(index))
                except core_exceptions.IndexExistsError:
                    # engine already holds the schema (orphan from a prior
                    # partial delete, or a bootstrap re-deploy) — adopting
                    # it matches bootstrap's idempotent semantics
                    logger.warning(f"Engine already has index {index.name}; "
                                   f"adopting existing schema")
                except Exception:
                    # compensate: a failed engine deploy must not leave a
                    # settings-store entry that makes every retry fail with
                    # IndexExistsError while the engine has no index
                    # (reference: bootstrap_vespa re-deploys missing engine
                    # indexes on restart; we repair at the failure site)
                    self._store.delete(index.name)
                    raise
                logger.info(f"Created index {index.name} "
                            f"(type={index.type.value}, model={index.model.name})")
            return indexes

    def delete_index_by_name(self, name: str) -> None:
        with self._ddl_lock():
            index = self._store.get(name)  # raises IndexNotFoundError
            self._store.delete(name)
            if self._engine.has_index(index.schema_name):
                self._engine.delete_index(index.schema_name)
            logger.info(f"Deleted index {name}")

    def batch_delete_indexes_by_name(self, names: List[str]) -> None:
        with self._ddl_lock():
            for name in names:
                if not self._store.contains(name):
                    raise core_exceptions.IndexNotFoundError(
                        f"Index {name} not found")
            for name in names:
                index = self._store.get(name)
                self._store.delete(name)
                if self._engine.has_index(index.schema_name):
                    self._engine.delete_index(index.schema_name)

    def update_index(self, index: SemiStructuredMarqoIndex) -> MarqoIndex:
        """Semi-structured dynamic schema growth: persist the updated field
        lists and swap the engine descriptor
        (reference index_management.py:192, semi_structured update)."""
        with self._ddl_lock():
            if not self._store.contains(index.name):
                raise core_exceptions.IndexNotFoundError(
                    f"Index {index.name} not found")
            # Rebase onto the STORED state under the DDL lock. Schema
            # growth from concurrent add-docs may hold a stale snapshot, so
            # MERGE field lists with the stored index rather than
            # overwrite — the reference prevents the lost-update anomaly
            # via optimistic-version conflicts + caller retry
            # (test_update_index_should_fail_under_race_condition); the
            # lock lets us resolve it in place instead.
            stored = self._store.get(index.name)
            lexical = {f.name: f for f in getattr(
                stored, "lexical_fields", [])}
            lexical.update({f.name: f for f in index.lexical_fields})
            tensor = {f.name: f for f in getattr(
                stored, "tensor_fields", [])}
            tensor.update({f.name: f for f in index.tensor_fields})
            updated = index.model_copy(update={
                "version": (stored.version or 1) + 1,
                "lexical_fields": list(lexical.values()),
                "tensor_fields": list(tensor.values())})
            self._store.save(updated, allow_existing=True)
            self._engine.update_index(descriptor_from_marqo_index(updated))
            return updated

    def rollback_index(self, name: str) -> MarqoIndex:
        with self._ddl_lock():
            index = self._store.rollback(name)
            self._engine.update_index(descriptor_from_marqo_index(index))
            return index

    def rollback_application(self) -> str:
        """Restore the whole settings store from the pre-upgrade backup
        and refresh engine descriptors (reference rollback_vespa,
        tensor_search/api.py:509 + index_management rollback_vespa)."""
        with self._ddl_lock():
            self._store.restore_application_backup()
            for index in self._store.get_all():
                self._engine.update_index(descriptor_from_marqo_index(index))
            return self._store.get_marqo_version()

    def get_index(self, name: str) -> MarqoIndex:
        return self._store.get(name)

    def get_all_indexes(self) -> List[MarqoIndex]:
        return self._store.get_all()

    def get_marqo_version(self) -> str:
        return self._store.get_marqo_version()
