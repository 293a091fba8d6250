"""Index meta cache: refresh daemon, force refresh, removal, param cache."""

import time

import pytest

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.config import Config
from marqo_tpu.core.exceptions import IndexNotFoundError


class TestIndexMetaCache:
    def test_force_refresh_sees_new_index(self):
        cfg = Config()
        cfg.index_management.bootstrap()
        with pytest.raises(IndexNotFoundError):
            cfg.index_meta_cache.get_index("late-index")
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("late-index"))
        index = cfg.index_meta_cache.get_index("late-index",
                                               force_refresh=True)
        assert index.name == "late-index"

    def test_refresh_daemon_picks_up_changes(self):
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_meta_cache.start_refresh_thread(interval=0.05)
        try:
            cfg.index_management.create_index(
                IndexSettings(model="random").to_marqo_index("daemon-index"))
            deadline = time.time() + 3
            while time.time() < deadline:
                if "daemon-index" in cfg.index_meta_cache._cache:
                    break
                time.sleep(0.05)
            assert "daemon-index" in cfg.index_meta_cache._cache
        finally:
            cfg.index_meta_cache.stop_refresh_thread()

    def test_remove_index(self):
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("gone-index"))
        cfg.index_meta_cache.get_index("gone-index")
        cfg.index_management.delete_index_by_name("gone-index")
        cfg.index_meta_cache.remove_index("gone-index")
        with pytest.raises(IndexNotFoundError):
            cfg.index_meta_cache.get_index("gone-index")


class TestParamDiskCache:
    def test_roundtrip(self, tmp_path, monkeypatch):
        import numpy as np
        import jax
        from marqo_tpu.inference import model_download
        from marqo_tpu.inference import loaders
        monkeypatch.setattr(model_download, "CACHE_DIR", str(tmp_path))
        from marqo_tpu.models.bert import TextEncoderConfig, init_params
        config = TextEncoderConfig(vocab_size=64, hidden_size=16,
                                   num_layers=2, num_heads=2,
                                   intermediate_size=32)
        params = init_params(config, jax.random.PRNGKey(0))
        loaders._save_param_cache("some/repo", config, params)
        loaded = loaders._load_param_cache("some/repo", config)
        assert loaded is not None
        for section in ("embeddings", "layers"):
            for key in params[section]:
                np.testing.assert_array_equal(
                    np.asarray(params[section][key]),
                    np.asarray(loaded[section][key]))

    def test_missing_returns_none(self, tmp_path, monkeypatch):
        from marqo_tpu.inference import model_download, loaders
        monkeypatch.setattr(model_download, "CACHE_DIR", str(tmp_path))
        from marqo_tpu.models.bert import TextEncoderConfig
        config = TextEncoderConfig(vocab_size=64, hidden_size=16,
                                   num_layers=2, num_heads=2,
                                   intermediate_size=32)
        assert loaders._load_param_cache("never/saved", config) is None
