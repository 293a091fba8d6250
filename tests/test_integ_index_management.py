"""Ported reference tests: index management DDL.

Source: /root/reference/tests/core/index_management/test_index_management.py
— create/delete round-trip, create-existing and delete-missing failures,
batch create/delete succeed together and fail ATOMICALLY (one bad name →
nothing changes), semi-structured update bumps the version, concurrent
stale updates merge instead of losing fields (the reference surfaces an
optimistic-version conflict + caller retry; our DDL lock resolves it in
place — same no-lost-update guarantee), and concurrent updates are
serialized by the DDL lock.
"""

import threading

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core import exceptions as core_exceptions
from marqo_tpu.core.models.marqo_index import (Field, FieldFeature,
                                               SemiStructuredMarqoIndex,
                                               TensorField)
from marqo_tpu.inference import vectorise as inference


def _index(name, model="random"):
    return IndexSettings(model=model).to_marqo_index(name)


@pytest.fixture
def config():
    inference.clear_loaded_models()
    cfg = Config()
    cfg.index_management.bootstrap()
    yield cfg


class TestIndexManagement:
    def test_create_and_delete_index_should_succeed(self, config):
        im = config.index_management
        im.create_index(_index("im-a"))
        assert im.get_index("im-a").name == "im-a"
        im.delete_index_by_name("im-a")
        with pytest.raises(core_exceptions.IndexNotFoundError):
            im.get_index("im-a")

    def test_create_index_should_fail_if_index_already_exists(self, config):
        im = config.index_management
        im.create_index(_index("im-dup"))
        with pytest.raises(core_exceptions.IndexExistsError) as e:
            im.create_index(_index("im-dup"))
        assert "im-dup" in str(e.value)

    def test_delete_index_should_fail_when_index_is_not_found(self, config):
        with pytest.raises(core_exceptions.IndexNotFoundError):
            config.index_management.delete_index_by_name("im-never")

    def test_batch_create_and_delete_index_should_succeed(self, config):
        im = config.index_management
        im.batch_create_indexes([_index("im-b1"), _index("im-b2")])
        assert im.get_index("im-b1") and im.get_index("im-b2")
        im.batch_delete_indexes_by_name(["im-b1", "im-b2"])
        for name in ("im-b1", "im-b2"):
            with pytest.raises(core_exceptions.IndexNotFoundError):
                im.get_index(name)

    def test_batch_create_index_should_fail_atomically(self, config):
        im = config.index_management
        im.create_index(_index("im-exists"))
        with pytest.raises(core_exceptions.IndexExistsError):
            im.batch_create_indexes([_index("im-new"), _index("im-exists")])
        with pytest.raises(core_exceptions.IndexNotFoundError):
            im.get_index("im-new")  # nothing was created

    def test_batch_delete_index_should_fail_atomically(self, config):
        im = config.index_management
        im.create_index(_index("im-keep"))
        with pytest.raises(core_exceptions.IndexNotFoundError):
            im.batch_delete_indexes_by_name(["im-keep", "im-missing"])
        assert im.get_index("im-keep")  # nothing was deleted

    def test_update_index_should_fail_if_index_does_not_exist(self, config):
        ghost = _index("im-ghost")
        assert isinstance(ghost, SemiStructuredMarqoIndex)
        with pytest.raises(core_exceptions.IndexNotFoundError):
            config.index_management.update_index(ghost)

    def test_update_index_bumps_version(self, config):
        im = config.index_management
        im.create_index(_index("im-up"))
        stored = im.get_index("im-up")
        v0 = stored.version or 1
        updated = im.update_index(stored.model_copy(update={
            "lexical_fields": [Field(
                name="f1", type="text",
                features=[FieldFeature.LexicalSearch],
                lexical_field_name="marqo__lexical_f1")]}))
        assert updated.version == v0 + 1
        assert im.get_index("im-up").version == v0 + 1

    def test_stale_concurrent_updates_merge_not_lose(self, config):
        """Two updaters holding the SAME base must not lose each other's
        fields (reference: second one conflicts + retries; ours merges
        under the DDL lock)."""
        im = config.index_management
        im.create_index(_index("im-race"))
        base = im.get_index("im-race")

        def with_field(idx, name):
            return idx.model_copy(update={
                "lexical_fields": list(idx.lexical_fields) + [Field(
                    name=name, type="text",
                    features=[FieldFeature.LexicalSearch],
                    lexical_field_name=f"marqo__lexical_{name}")]})

        im.update_index(with_field(base, "field_a"))
        im.update_index(with_field(base, "field_b"))  # stale base
        final = im.get_index("im-race")
        names = {f.name for f in final.lexical_fields}
        assert {"field_a", "field_b"} <= names, \
            f"lost update: {names}"

    def test_concurrent_updates_serialized_by_lock(self, config):
        im = config.index_management
        im.create_index(_index("im-threads"))
        base = im.get_index("im-threads")
        errors = []

        def add_field(i):
            try:
                idx = base.model_copy(update={
                    "lexical_fields": list(base.lexical_fields) + [Field(
                        name=f"tf{i}", type="text",
                        features=[FieldFeature.LexicalSearch],
                        lexical_field_name=f"marqo__lexical_tf{i}")]})
                im.update_index(idx)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=add_field, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        final = im.get_index("im-threads")
        names = {f.name for f in final.lexical_fields}
        assert {f"tf{i}" for i in range(8)} <= names
        assert final.version == (base.version or 1) + 8

    def test_tensor_fields_merge_too(self, config):
        im = config.index_management
        im.create_index(_index("im-tensor"))
        base = im.get_index("im-tensor")

        def with_tensor(idx, name):
            return idx.model_copy(update={
                "tensor_fields": list(idx.tensor_fields) + [TensorField(
                    name=name,
                    chunk_field_name=f"marqo__chunks_{name}",
                    embeddings_field_name=f"marqo__embeddings_{name}")]})

        im.update_index(with_tensor(base, "t_a"))
        im.update_index(with_tensor(base, "t_b"))
        final = im.get_index("im-tensor")
        assert {"t_a", "t_b"} <= {f.name for f in final.tensor_fields}

    def test_get_all_indexes_lists_created(self, config):
        im = config.index_management
        im.create_index(_index("im-list-1"))
        im.create_index(_index("im-list-2"))
        names = {i.name for i in im.get_all_indexes()}
        assert {"im-list-1", "im-list-2"} <= names


class TestDeploymentLockTimeout:
    """MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT is honored per-operation
    (reference api/configs.py:54 default 5; config.py:46 reads the env)."""

    def test_default_is_five_seconds(self, monkeypatch):
        from marqo_tpu.core.index_management import index_management as im_mod
        monkeypatch.delenv("MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT",
                           raising=False)
        assert im_mod._deployment_lock_timeout() == 5.0

    def test_env_override_and_bad_values(self, monkeypatch):
        from marqo_tpu.core.index_management import index_management as im_mod
        monkeypatch.setenv("MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT", "2")
        assert im_mod._deployment_lock_timeout() == 2.0
        monkeypatch.setenv("MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT", "bogus")
        assert im_mod._deployment_lock_timeout() == 5.0

    def test_ddl_lock_uses_env_timeout(self, config, monkeypatch):
        monkeypatch.setenv("MARQO_INDEX_DEPLOYMENT_LOCK_TIMEOUT", "0.25")
        im = config.index_management
        seen = {}
        real_context = im._lock.context

        def spy(timeout, failure_message):
            seen["timeout"] = timeout
            return real_context(timeout=timeout,
                                failure_message=failure_message)

        monkeypatch.setattr(im._lock, "context", spy)
        im.create_index(_index("im-lock-timeout"))
        assert seen["timeout"] == 0.25
