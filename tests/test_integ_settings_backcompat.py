"""Ported reference tests: GET settings backwards compatibility.

Source: /root/reference/tests/tensor_search/
test_get_settings_backwards_compatibility.py — settings rendered for a
pre-2.12 index (no video/audio preprocessing stored) must NOT contain
videoPreprocessing/audioPreprocessing keys, while newly created (≥2.12)
indexes carry both defaults.
"""

from marqo_tpu.api.models.index_settings import IndexSettings
from marqo_tpu.core.models import marqo_index as core


def _common(**kwargs):
    base = dict(
        name="test_index", schema_name="test_schema",
        model=core.Model(name="test_model"),
        normalize_embeddings=True,
        text_preprocessing=core.TextPreProcessing(
            split_length=100, split_overlap=0,
            split_method=core.TextSplitMethod.Word),
        image_preprocessing=core.ImagePreProcessing(),
        distance_metric=core.DistanceMetric.PrenormalizedAngular,
        vector_numeric_type=core.VectorNumericType.Float,
        hnsw_config=core.HnswConfig(ef_construction=128, m=16),
        marqo_version="2.11.0",
        video_preprocessing=None, audio_preprocessing=None)
    base.update(kwargs)
    return base


COMMON_EXPECTED = ["type", "model", "normalizeEmbeddings",
                   "textPreprocessing", "imagePreprocessing",
                   "vectorNumericType", "annParameters"]


class TestSettingsBackwardsCompatibility:
    def test_pre_2_12_structured_index_omits_av_blocks(self):
        index = core.StructuredMarqoIndex(**_common(
            type=core.IndexType.Structured, fields=[], tensor_fields=[]))
        settings = IndexSettings.from_marqo_index(index)
        for field in COMMON_EXPECTED:
            assert field in settings
        assert "videoPreprocessing" not in settings
        assert "audioPreprocessing" not in settings

    def test_pre_2_12_unstructured_index_omits_av_blocks(self):
        index = core.UnstructuredMarqoIndex(**_common(
            type=core.IndexType.Unstructured))
        settings = IndexSettings.from_marqo_index(index)
        for field in COMMON_EXPECTED:
            assert field in settings
        assert "videoPreprocessing" not in settings
        assert "audioPreprocessing" not in settings

    def test_new_index_carries_av_defaults(self):
        index = IndexSettings(model="test").to_marqo_index("new-ix")
        settings = IndexSettings.from_marqo_index(index)
        assert settings["videoPreprocessing"] == {"splitLength": 20,
                                                  "splitOverlap": 3}
        assert settings["audioPreprocessing"] == {"splitLength": 10,
                                                  "splitOverlap": 3}
