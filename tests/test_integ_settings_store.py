"""Ported reference tests: settings-store optimistic versioning.

Source: /root/reference/tests/core/index_management/test_index_setting_store.py
— create stamps version 1 (explicit version > 1 conflicts), updates must
carry current + 1, history persists superseded versions, deletes keep
history, deleting a nonexistent index is a no-op.
"""

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.core.exceptions import OperationConflictError
from marqo_tpu.core.index_management.settings_store import IndexSettingsStore


def _index(name="vs-index", version=None):
    idx = IndexSettings(model="random").to_marqo_index(name)
    if version is not None:
        idx = idx.model_copy(update={"version": version})
    return idx


class TestSettingsStoreVersioning:
    def test_create_without_version_stamps_1(self):
        store = IndexSettingsStore()
        store.save(_index())
        assert store.get("vs-index").version == 1

    def test_create_with_version_1_succeeds(self):
        store = IndexSettingsStore()
        store.save(_index(version=1))
        assert store.get("vs-index").version == 1

    def test_create_with_version_2_conflicts(self):
        store = IndexSettingsStore()
        with pytest.raises(OperationConflictError) as e:
            store.save(_index(version=2))
        assert "does not exist or has been deleted" in str(e.value)

    def test_update_with_correct_version_succeeds_and_keeps_history(self):
        store = IndexSettingsStore()
        store.save(_index(version=1))
        store.save(_index(version=2), allow_existing=True)
        assert store.get("vs-index").version == 2
        history = store.get_history("vs-index")
        assert len(history) == 1
        assert history[0]["version"] == 1

    def test_update_with_wrong_version_conflicts(self):
        store = IndexSettingsStore()
        store.save(_index(version=1))
        with pytest.raises(OperationConflictError) as e:
            store.save(_index(version=1), allow_existing=True)
        assert "Current version is 1, and cannot be upgraded to target " \
               "version 1" in str(e.value)

    def test_delete_keeps_history(self):
        store = IndexSettingsStore()
        store.save(_index(version=1))
        store.delete("vs-index")
        assert not store.contains("vs-index")
        history = store.get_history("vs-index")
        assert len(history) == 1

    def test_stale_schema_growth_rebases(self):
        """update_index rebases onto the stored version under the DDL
        lock, so a stale in-memory index snapshot still updates."""
        from marqo_tpu.config import Config
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(_index("vs-rebase"))
        stale = cfg.index_management.get_index("vs-rebase")
        # someone else updates first
        cfg.index_management.update_index(
            cfg.index_management.get_index("vs-rebase"))
        # the stale snapshot still succeeds (rebases to current + 1)
        updated = cfg.index_management.update_index(stale)
        assert updated.version == 3
