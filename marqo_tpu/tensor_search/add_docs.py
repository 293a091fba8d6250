"""Media download + preprocessing for add_documents and image queries.

Parity: reference src/marqo/tensor_search/add_docs.py — thread-pool
download/preprocess per batch (:39-330, thread counts from
MARQO_IMAGE_DOWNLOAD_THREAD_COUNT_PER_REQUEST=20 / MEDIA_…=5),
modality inference by extension/bytes sniffing
(s2_inference/multimodal_model_load.py:148), per-thread metric merge
(:384). pycurl → requests here; local file paths and data URIs are also
accepted (the reference accepts local paths when ``_is_image`` matches).
"""

import base64
import concurrent.futures
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from marqo_tpu.api import configs
from marqo_tpu.core.exceptions import InvalidArgumentError
from marqo_tpu.inference.types import Modality
from marqo_tpu.logging import get_logger

logger = get_logger(__name__)

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp", ".tiff")
VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".webm")
AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".ogg", ".aac")

_URL_RE = re.compile(r"^https?://", re.IGNORECASE)

# magic bytes → modality (reference infer_modality byte sniffing)
_MAGIC = [
    (b"\x89PNG", Modality.IMAGE),
    (b"\xff\xd8\xff", Modality.IMAGE),
    (b"GIF8", Modality.IMAGE),
    (b"BM", Modality.IMAGE),
    (b"RIFF", Modality.IMAGE),  # webp (RIFF....WEBP); wav handled below
    (b"ID3", Modality.AUDIO),
    (b"fLaC", Modality.AUDIO),
    (b"OggS", Modality.AUDIO),
]


def is_media_pointer(value: str) -> bool:
    """Could this string be a URL/path to media? (reference _is_image,
    clip_utils.py:28)."""
    if not isinstance(value, str) or not value:
        return False
    lowered = value.lower()
    if _URL_RE.match(value) or value.startswith("data:image/"):
        return True
    if lowered.endswith(IMAGE_EXTENSIONS + VIDEO_EXTENSIONS + AUDIO_EXTENSIONS):
        return True
    return False


def infer_modality(value: Any) -> Modality:
    """Infer the modality of content (extension first, then magic bytes)."""
    if isinstance(value, bytes):
        if value[:4] == b"RIFF" and value[8:12] == b"WAVE":
            return Modality.AUDIO
        for magic, modality in _MAGIC:
            if value.startswith(magic):
                return modality
        return Modality.TEXT
    if not isinstance(value, str):
        return Modality.IMAGE  # ndarray / PIL image objects
    lowered = value.split("?")[0].lower()
    if value.startswith("data:image/"):
        return Modality.IMAGE
    if lowered.endswith(IMAGE_EXTENSIONS):
        return Modality.IMAGE
    if lowered.endswith(VIDEO_EXTENSIONS):
        return Modality.VIDEO
    if lowered.endswith(AUDIO_EXTENSIONS):
        return Modality.AUDIO
    if _URL_RE.match(value):
        # extension-less URL: sniff a content sample's magic bytes
        # (reference multimodal_model_load.py:167-183 fetch_content_sample
        # + libmagic; test_no_extension_image_url_infer_modality)
        try:
            import requests
            with requests.get(encode_url(value), stream=True, timeout=3.0,
                              headers=dict(DEFAULT_MEDIA_HEADERS)) as resp:
                resp.raise_for_status()
                sample = next(resp.iter_content(chunk_size=10240), b"")
        except Exception as e:
            raise MediaDownloadError(
                f"Error downloading media file {value}: {e}") from e
        return infer_modality(sample)
    return Modality.TEXT


class MediaDownloadError(InvalidArgumentError):
    pass


def encode_url(url: str) -> str:
    """Percent-encode a URL the way the reference does (clip_utils.py:196-215
    encode_url = requests.utils.requote_uri: spaces/unicode encoded,
    existing %-escapes and reserved characters preserved)."""
    import requests.utils
    return requests.utils.requote_uri(url)


# reference clip_utils.py:148-193 download_image_from_url sends a default
# bot User-Agent; request-supplied headers may override it
DEFAULT_MEDIA_HEADERS = {"User-Agent": "Marqobot/1.0"}


def fetch_content(pointer: str,
                  media_download_headers: Optional[Dict[str, str]] = None,
                  timeout: float = 3.0) -> bytes:
    """Fetch one media pointer: http(s) URL, local path, or data URI."""
    if pointer.startswith("data:"):
        try:
            _, b64 = pointer.split(",", 1)
            return base64.b64decode(b64)
        except Exception as e:
            raise MediaDownloadError(f"Invalid data URI: {e}")
    if _URL_RE.match(pointer):
        import requests
        headers = {**DEFAULT_MEDIA_HEADERS, **(media_download_headers or {})}
        try:
            resp = requests.get(encode_url(pointer), headers=headers,
                                timeout=timeout)
            resp.raise_for_status()
            return resp.content
        except Exception as e:
            raise MediaDownloadError(
                f"Could not download media from `{pointer}`: {e}")
    if os.path.isfile(pointer):
        with open(pointer, "rb") as f:
            return f.read()
    raise MediaDownloadError(
        f"Could not find media at `{pointer}`: not a URL, data URI, or "
        f"existing local file")


def _load_image(pointer: str, headers: Optional[Dict[str, str]]) -> np.ndarray:
    from marqo_tpu.ops.image_ops import host_decode
    data = fetch_content(pointer, headers)
    try:
        return host_decode(data)
    except Exception as e:
        raise MediaDownloadError(
            f"Could not decode image from `{pointer}`: {e}")


def _determine_thread_count(marqo_index, add_docs_params) -> int:
    """Download-thread-count precedence (reference add_docs.py:255-287):
    explicit non-default media param > non-default MARQO_MEDIA_DOWNLOAD_
    THREAD_COUNT_PER_REQUEST > languagebind default 5 > explicit
    non-default image param > non-default MARQO_IMAGE_DOWNLOAD_THREAD_
    COUNT_PER_REQUEST > default 20."""
    model_properties = marqo_index.model.get_properties()
    is_languagebind_model = model_properties.get("type") == "languagebind"

    default_image_thread_count = 20
    default_media_thread_count = 5

    media_count = getattr(add_docs_params, "media_download_thread_count",
                          None)
    if media_count is not None and media_count != default_media_thread_count:
        return media_count

    env_media = os.environ.get(
        "MARQO_MEDIA_DOWNLOAD_THREAD_COUNT_PER_REQUEST")
    if env_media is not None and int(env_media) != default_media_thread_count:
        return int(env_media)

    if is_languagebind_model:
        return default_media_thread_count

    image_count = getattr(add_docs_params, "image_download_thread_count",
                          None)
    if image_count is not None and image_count != default_image_thread_count:
        return image_count

    env_image = os.environ.get(
        "MARQO_IMAGE_DOWNLOAD_THREAD_COUNT_PER_REQUEST")
    if env_image is not None and int(env_image) != default_image_thread_count:
        return int(env_image)

    return default_image_thread_count


def threaded_download_and_preprocess_content(
        pointers: List[str],
        modality: Modality = Modality.IMAGE,
        media_download_headers: Optional[Dict[str, str]] = None,
        thread_count: Optional[int] = None,
) -> Tuple[Dict[str, Any], Dict[str, str]]:
    """Download + decode a batch of media pointers on a thread pool.

    Returns (pointer → decoded content, pointer → error message).
    """
    if thread_count is None:
        # defaults mirror _determine_thread_count: images 20, other media 5
        if modality == Modality.IMAGE:
            thread_count = configs.read_env_vars_and_defaults_ints(
                "MARQO_IMAGE_DOWNLOAD_THREAD_COUNT_PER_REQUEST") or 20
        else:
            thread_count = configs.read_env_vars_and_defaults_ints(
                "MARQO_MEDIA_DOWNLOAD_THREAD_COUNT_PER_REQUEST") or 5
    results: Dict[str, Any] = {}
    errors: Dict[str, str] = {}
    unique = list(dict.fromkeys(pointers))
    if not unique:
        return results, errors

    def work(pointer: str):
        if modality == Modality.IMAGE:
            return pointer, _load_image(pointer, media_download_headers)
        return pointer, fetch_content(pointer, media_download_headers)

    max_workers = max(1, min(thread_count, len(unique)))
    with concurrent.futures.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = {ex.submit(work, p): p for p in unique}
        for future in concurrent.futures.as_completed(futures):
            pointer = futures[future]
            try:
                _, content = future.result()
                results[pointer] = content
            except Exception as e:
                errors[pointer] = str(e)
    return results, errors
