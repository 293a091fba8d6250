"""Ported reference tests: modality inference.

Source: /root/reference/tests/tensor_search/test_infer_modality.py —
extensions map to modalities, plain text/invalid URLs/empty values/lists
are TEXT, magic bytes classify raw content.
"""

import numpy as np
import pytest

from marqo_tpu.inference.types import Modality
from marqo_tpu.tensor_search.add_docs import infer_modality


class TestInferModality:
    def test_text(self):
        assert infer_modality("This is a sample text.") == Modality.TEXT
        assert infer_modality("") == Modality.TEXT

    def test_url_with_extension(self):
        assert infer_modality("https://example.com/image.jpg") == \
            Modality.IMAGE
        assert infer_modality("https://example.com/video.mp4") == \
            Modality.VIDEO
        assert infer_modality("https://example.com/audio.mp3") == \
            Modality.AUDIO

    def test_url_with_query_string(self):
        assert infer_modality(
            "https://example.com/image.jpg?size=large") == Modality.IMAGE

    def test_invalid_url_is_text(self):
        assert infer_modality("not_a_url") == Modality.TEXT

    def test_magic_bytes(self):
        assert infer_modality(b"\xff\xd8\xff") == Modality.IMAGE  # JPEG
        assert infer_modality(b"\x89PNG\r\n\x1a\n") == Modality.IMAGE
        assert infer_modality(b"ID3\x04rest") == Modality.AUDIO   # MP3
        riff_wav = b"RIFF\x00\x00\x00\x00WAVEfmt "
        assert infer_modality(riff_wav) == Modality.AUDIO
        assert infer_modality(b"plain text bytes") == Modality.TEXT

    def test_empty_bytes_is_text(self):
        assert infer_modality(b"") == Modality.TEXT

    def test_data_uri_image(self):
        assert infer_modality("data:image/png;base64,AAAA") == \
            Modality.IMAGE

    def test_array_is_image(self):
        assert infer_modality(np.zeros((4, 4, 3), np.uint8)) == \
            Modality.IMAGE


class TestIsMediaPointer:
    """Ported reference _is_image goldens (tests/s2_inference/
    test_clip_utils.py:62-101) against our is_media_pointer."""

    CASES = [
        ("image.jpg", True), ("image.png", True), ("image.jpeg", True),
        ("image.bmp", True), ("image.JPG", True), ("image.PNG", True),
        ("https://example.com/image.jpg", True),
        ("document.pdf", False), ("text.txt", False),
        ("imagewithoutextension", False),
        ("http://dummy.dummy.com/is/image/dummy/dummy (1)"
         "?wid=123&hei=321&qlt=123&fmt=png-alpha", True),
    ]

    @pytest.mark.parametrize("value,expected", CASES)
    def test_is_media_pointer_goldens(self, value, expected):
        from marqo_tpu.tensor_search.add_docs import is_media_pointer
        assert is_media_pointer(value) is expected

    def test_non_string_inputs_false(self):
        from marqo_tpu.tensor_search.add_docs import is_media_pointer
        assert is_media_pointer(123) is False
        assert is_media_pointer(None) is False
        assert is_media_pointer("") is False
