"""Unit tests for auxiliary subsystems: vector interpolation, telemetry,
throttling, settings-store rollback, text chunking, env config."""

import math
import threading

import numpy as np
import pytest

from marqo_tpu.api import configs
from marqo_tpu.api.telemetry import RequestMetrics, RequestMetricsStore
from marqo_tpu.api.throttling import RequestType, current_concurrency, throttle
from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       ZeroMagnitudeVectorError)
from marqo_tpu.core.models.marqo_index import (TextPreProcessing,
                                               TextSplitMethod)
from marqo_tpu.core.utils.vector_interpolation import (Lerp, Nlerp, Slerp,
                                                       from_interpolation_method,
                                                       InterpolationMethod)
from marqo_tpu.inference.text_chunker import chunk_text, split_sentences


class TestVectorInterpolation:
    def test_lerp_weighted(self):
        out = Lerp().interpolate([[1, 0], [0, 1]], [3, 1])
        np.testing.assert_allclose(out, [0.75, 0.25])

    def test_lerp_zero_weights_raises(self):
        with pytest.raises(InvalidArgumentError):
            Lerp().interpolate([[1, 0], [0, 1]], [1, -1])

    def test_nlerp_normalizes(self):
        out = Nlerp().interpolate([[2, 0], [0, 2]], [1, 1])
        assert abs(np.linalg.norm(out) - 1) < 1e-9

    def test_nlerp_zero_magnitude_raises(self):
        with pytest.raises(ZeroMagnitudeVectorError):
            Nlerp().interpolate([[1, 0], [-1, 0]], [1, 1])

    def test_slerp_unit_circle(self):
        out = Slerp().interpolate([[1, 0], [0, 1]], [1, 1])
        expected = [math.cos(math.pi / 4), math.sin(math.pi / 4)]
        np.testing.assert_allclose(out, expected, atol=1e-9)

    def test_slerp_zero_vector_raises(self):
        with pytest.raises(ZeroMagnitudeVectorError):
            Slerp().interpolate([[0, 0], [1, 0]], [1, 1])

    def test_slerp_single_vector(self):
        np.testing.assert_allclose(
            Slerp().interpolate([[3, 4]]), [3, 4])

    def test_factory(self):
        assert isinstance(from_interpolation_method(InterpolationMethod.LERP),
                          Lerp)

    def test_slerp_default_is_hierarchical(self):
        """Reference vector_interpolation.py:126-128 defaults to the
        hierarchical (pairwise-tree) reduction."""
        from marqo_tpu.core.utils.vector_interpolation import SlerpMethod
        assert Slerp().method == SlerpMethod.HIERARCHICAL
        slerp = from_interpolation_method(InterpolationMethod.SLERP)
        assert slerp.method == SlerpMethod.HIERARCHICAL

    def test_hierarchical_reduces_pairwise(self):
        """4 vectors: result == slerp(slerp(v0,v1,·), slerp(v2,v3,·), ·)
        with pair weights halved (reference :211-237)."""
        from marqo_tpu.core.utils.vector_interpolation import SlerpMethod
        vecs = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.6, 0.8]]
        ws = [1.0, 3.0, 2.0, 2.0]
        slerp = Slerp()
        got = slerp.interpolate(vecs, ws)
        import numpy as np
        left = np.asarray(slerp._slerp_pair(
            np.asarray(vecs[0]), np.asarray(vecs[1]), 3.0 / 4.0))
        right = np.asarray(slerp._slerp_pair(
            np.asarray(vecs[2]), np.asarray(vecs[3]), 2.0 / 4.0))
        # new weights are (1+3)/2=2 and (2+2)/2=2 → t = 2/(2+2)
        expected = slerp._slerp_pair(left, right, 0.5)
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_hierarchical_odd_tail_passes_through(self):
        from marqo_tpu.core.utils.vector_interpolation import SlerpMethod
        vecs = [[1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
        ws = [1.0, 1.0, 2.0]
        slerp = Slerp()
        got = slerp.interpolate(vecs, ws)
        import numpy as np
        pair = np.asarray(slerp._slerp_pair(
            np.asarray(vecs[0]), np.asarray(vecs[1]), 0.5))
        # level 2: weights [1.0 (halved sum), 2.0] → t = 2/3
        expected = slerp._slerp_pair(pair, np.asarray(vecs[2]), 2.0 / 3.0)
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_sequential_halves_accumulated_weight(self):
        """Reference :195-209 — after folding a pair, the carried weight is
        (w0+w1)/2, NOT the full sum; affects every 3+-vector interpolation."""
        from marqo_tpu.core.utils.vector_interpolation import SlerpMethod
        vecs = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
        ws = [1.0, 1.0, 1.0]
        slerp = Slerp(method=SlerpMethod.SEQUENTIAL)
        got = slerp.interpolate(vecs, ws)
        import numpy as np
        step1 = np.asarray(slerp._slerp_pair(
            np.asarray(vecs[0]), np.asarray(vecs[1]), 0.5))
        # carried weight = (1+1)/2 = 1 → t = 1/(1+1) = 0.5
        expected = slerp._slerp_pair(step1, np.asarray(vecs[2]), 0.5)
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_zero_pair_weight_sum_raises(self):
        with pytest.raises(InvalidArgumentError, match="sum weight of zero"):
            Slerp().interpolate([[1.0, 0.0], [0.0, 1.0]], [1.0, -1.0])

    def test_weight_count_mismatch(self):
        with pytest.raises(InvalidArgumentError):
            Lerp().interpolate([[1, 0]], [1, 2])


class TestTelemetry:
    def test_timers_and_counters(self):
        metrics = RequestMetrics()
        with metrics.time("stage.a"):
            pass
        metrics.increment_counter("hits", 3)
        data = metrics.json()
        assert "stage.a" in data["timesMs"]
        assert data["counter"]["hits"] == 3

    def test_thread_scoped_store(self):
        RequestMetricsStore.set_in_request()
        RequestMetricsStore.for_request().increment_counter("x")
        seen = {}

        def other_thread():
            seen["counters"] = dict(
                RequestMetricsStore.for_request().counters)

        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        assert seen["counters"] == {}  # isolation between threads
        assert RequestMetricsStore.for_request().counters == {"x": 1}
        RequestMetricsStore.clear()

    def test_merge_thread_metrics(self):
        RequestMetricsStore.set_in_request()
        worker = RequestMetrics()
        worker.add_time("download", 12.5)
        worker.increment_counter("images", 2)
        RequestMetricsStore.merge(worker)
        merged = RequestMetricsStore.for_request().json()
        assert merged["timesMs"]["download"] == 12.5
        assert merged["counter"]["images"] == 2
        RequestMetricsStore.clear()


class TestThrottling:
    def test_throttle_releases(self):
        @throttle(RequestType.SEARCH)
        def op():
            return current_concurrency(RequestType.SEARCH)

        assert op() == 1
        assert current_concurrency(RequestType.SEARCH) == 0

    def test_throttle_rejects_at_limit(self, monkeypatch):
        from marqo_tpu.api.exceptions import TooManyRequestsError
        monkeypatch.setenv("MARQO_MAX_CONCURRENT_SEARCH", "1")
        release = threading.Event()
        started = threading.Event()

        @throttle(RequestType.SEARCH)
        def blocker():
            started.set()
            release.wait(5)

        t = threading.Thread(target=blocker)
        t.start()
        started.wait(5)

        @throttle(RequestType.SEARCH)
        def second():
            return True

        with pytest.raises(TooManyRequestsError):
            second()
        release.set()
        t.join()
        assert second() is True

    def test_throttling_disabled(self, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_THROTTLING", "FALSE")
        monkeypatch.setenv("MARQO_MAX_CONCURRENT_SEARCH", "0")

        @throttle(RequestType.SEARCH)
        def op():
            return True

        assert op() is True


class TestSettingsRollback:
    def test_history_and_rollback(self):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.index_management.settings_store import \
            IndexSettingsStore
        store = IndexSettingsStore()
        store.bootstrap()
        v1 = IndexSettings(model="test").to_marqo_index("idx")
        store.save(v1)
        v2 = v1.model_copy(update={"version": 2})
        store.save(v2, allow_existing=True)
        assert store.get("idx").version == 2
        restored = store.rollback("idx")
        assert restored.version == 1

    def test_rollback_without_history_raises(self):
        from marqo_tpu.core.exceptions import ApplicationRollbackError
        from marqo_tpu.core.index_management.settings_store import \
            IndexSettingsStore
        store = IndexSettingsStore()
        store.bootstrap()
        with pytest.raises(ApplicationRollbackError):
            store.rollback("nope")

    def test_disk_persistence_roundtrip(self, tmp_path):
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.core.index_management.settings_store import \
            IndexSettingsStore
        store = IndexSettingsStore(str(tmp_path))
        store.bootstrap()
        store.save(IndexSettings(model="test").to_marqo_index("persisted"))
        # fresh store instance reads from disk
        reloaded = IndexSettingsStore(str(tmp_path))
        assert reloaded.is_initialized()
        assert reloaded.get("persisted").model.name == "test"


class TestTextChunker:
    def test_sentence_split(self):
        text = "Hello world. This is Dr. Smith. He works at Acme Inc."
        sentences = split_sentences(text)
        assert sentences[0] == "Hello world."
        assert any("Dr. Smith" in s for s in sentences)

    def test_sentence_chunks_with_overlap(self):
        config = TextPreProcessing(split_length=2, split_overlap=1,
                                   split_method=TextSplitMethod.Sentence)
        chunks = chunk_text("One. Two. Three. Four.", config)
        assert chunks[0] == "One. Two."
        assert chunks[1] == "Two. Three."

    def test_word_split(self):
        config = TextPreProcessing(split_length=3, split_overlap=0,
                                   split_method=TextSplitMethod.Word)
        chunks = chunk_text("a b c d e f g", config)
        assert chunks == ["a b c", "d e f", "g"]

    def test_character_split(self):
        config = TextPreProcessing(split_length=4, split_overlap=0,
                                   split_method=TextSplitMethod.Character)
        assert chunk_text("abcdefgh", config) == ["abcd", "efgh"]

    def test_passage_split(self):
        config = TextPreProcessing(split_length=1, split_overlap=0,
                                   split_method=TextSplitMethod.Passage)
        chunks = chunk_text("Para one.\n\nPara two.", config)
        assert chunks == ["Para one.", "Para two."]

    def test_empty_text(self):
        # reference coerces empty → [" "] (see module-level test below)
        config = TextPreProcessing()
        assert chunk_text("   ", config) == [" "]


class TestEnvConfig:
    def test_defaults(self):
        assert configs.read_env_vars_and_defaults_ints(
            "MARQO_MAX_CONCURRENT_SEARCH") == 8

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("MARQO_MAX_CONCURRENT_SEARCH", "42")
        assert configs.read_env_vars_and_defaults_ints(
            "MARQO_MAX_CONCURRENT_SEARCH") == 42

    def test_bool_parsing(self, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_THROTTLING", "false")
        assert configs.read_env_vars_and_defaults_bool(
            "MARQO_ENABLE_THROTTLING") is False

    def test_list_parsing(self, monkeypatch):
        monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", '["a", "b"]')
        assert configs.read_env_vars_and_defaults_list(
            "MARQO_MODELS_TO_PRELOAD") == ["a", "b"]

    def test_invalid_int_raises(self, monkeypatch):
        monkeypatch.setenv("MARQO_MAX_CONCURRENT_SEARCH", "nope")
        with pytest.raises(Exception):
            configs.read_env_vars_and_defaults_ints(
                "MARQO_MAX_CONCURRENT_SEARCH")


class TestUpgradeRunner:
    def test_upgrade_noop_same_version(self):
        from marqo_tpu.config import Config
        from marqo_tpu.core.upgrades import UpgradeRunner
        cfg = Config()
        cfg.index_management.bootstrap()
        result = UpgradeRunner(cfg.index_management).upgrade()
        assert result["migrated"] == 0

    def test_find_migration_path_multi_hop(self):
        """2.11→2.13 composes 2.11→2.12 then 2.12→2.13 (reference
        upgrade.py:50 selects a per-version path; multi-hop must chain)."""
        from marqo_tpu.core import upgrades

        def bump_a(doc):
            doc = dict(doc)
            doc["_hop_a"] = True
            return doc

        upgrades._MIGRATIONS[("2.11", "2.12")] = bump_a
        try:
            path = upgrades.find_migration_path("2.11", "2.13")
            assert path is not None and len(path) == 2
            assert path[0] is bump_a
            # direct single-hop still wins when registered
            assert upgrades.find_migration_path("2.12", "2.13") is not None
            assert len(upgrades.find_migration_path("2.12", "2.13")) == 1
            # no path → None (upgrade() turns this into InternalError)
            assert upgrades.find_migration_path("1.0", "2.13") is None
        finally:
            del upgrades._MIGRATIONS[("2.11", "2.12")]

    def test_upgrade_chains_across_versions(self, monkeypatch):
        """A store stamped 2.11 upgrades through BOTH hops: the fake
        2.11→2.12 marker migration and the real 2.12→2.13 one (which
        defaults the video/audio preprocessing blocks)."""
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.core import upgrades
        from marqo_tpu.core.upgrades import UpgradeRunner

        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("up-chain-index"))
        store = cfg.index_management.settings_store
        store.set_marqo_version("2.11.2")
        # make the persisted index look like it was created under 2.11
        import json

        from marqo_tpu.core.models.marqo_index import MarqoIndex
        old_doc = json.loads(store.get("up-chain-index").model_dump_json())
        old_doc["marqo_version"] = "2.11.2"
        old_doc["version"] = (old_doc.get("version") or 1) + 1
        store.save(MarqoIndex.parse_obj(old_doc), allow_existing=True)

        def fake_2_11_to_2_12(doc):
            doc = dict(doc)
            if doc.get("marqo_version", "").startswith("2.11"):
                doc["marqo_version"] = "2.12.0"
            return doc

        upgrades._MIGRATIONS[("2.11", "2.12")] = fake_2_11_to_2_12
        try:
            result = UpgradeRunner(cfg.index_management).upgrade()
        finally:
            del upgrades._MIGRATIONS[("2.11", "2.12")]
        assert result["from"] == "2.11"
        assert result["migrated"] == 1
        migrated = store.get("up-chain-index")
        # the second hop re-stamped the per-index version marker
        assert upgrades._minor(migrated.marqo_version) == \
            upgrades._minor(upgrades.__version__)


class TestRequestLimits:
    def test_searchable_attributes_cap(self, monkeypatch):
        from marqo_tpu.api.exceptions import InvalidArgError
        from marqo_tpu.api.models.index_settings import IndexSettings
        from marqo_tpu.config import Config
        from marqo_tpu.tensor_search import tensor_search
        monkeypatch.setenv("MARQO_MAX_SEARCHABLE_TENSOR_ATTRIBUTES", "2")
        cfg = Config()
        cfg.index_management.bootstrap()
        cfg.index_management.create_index(
            IndexSettings(model="random").to_marqo_index("cap-index"))
        cfg.index_meta_cache.populate()
        with pytest.raises(InvalidArgError):
            tensor_search.search(cfg, "cap-index", text="x",
                                 searchable_attributes=["a", "b", "c"])

    def test_ef_construction_cap(self, monkeypatch):
        from marqo_tpu.api.models.index_settings import IndexSettings
        monkeypatch.setenv("MARQO_EF_CONSTRUCTION_MAX_VALUE", "1024")
        with pytest.raises(Exception):
            IndexSettings(model="random",
                          annParameters={"spaceType": "prenormalized-angular",
                                         "parameters": {"efConstruction": 5000,
                                                        "m": 16}})


def test_chunk_text_empty_becomes_single_space_chunk():
    """Reference split_text coerces empty/whitespace to [' ']
    (tests/processing/test_split_text.py:28) — a doc with an empty tensor
    field still stores one vector."""
    from marqo_tpu.core.models.marqo_index import TextPreProcessing
    config = TextPreProcessing()
    for text in ("", "   ", "\r\t", None):
        assert chunk_text(text or "", config) == [" "]
