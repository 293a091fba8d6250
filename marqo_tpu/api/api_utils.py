"""Query-string helpers for the HTTP layer.

Parity: reference tensor_search/web/api_utils.py — translate_api_device
(:12-51, "cuda2" -> "cuda:2"), decode_image_download_headers (:53-73),
decode_query_string_model_auth (:76-97). The acceptable device set adds
"tpu" (this build's accelerator) to the reference's {cpu, cuda}.
"""

import json
import urllib.parse
from typing import Optional

from marqo_tpu.api.exceptions import InvalidArgError

ACCEPTABLE_DEVICES = ["cpu", "cuda", "tpu"]


def translate_api_device(device: Optional[str]) -> Optional[str]:
    """"CUDA2" -> "cuda:2", "cpu1" -> "cpu:1", case-insensitive; a bare
    prefix passes through lowered. Unknown prefixes or bare numbers raise
    InvalidArgError (reference api_utils.py:12-51 exact algorithm)."""
    if device is None:
        return device
    lowered_device = device.lower()
    match_attempt = [
        (lowered_device.startswith(acceptable),
         lowered_device.replace(acceptable, ""),
         acceptable)
        for acceptable in ACCEPTABLE_DEVICES]
    try:
        matched = [attempt for attempt in match_attempt if attempt[0]][0]
        prefix, suffix = matched[2], matched[1]
        if not suffix:
            return prefix
        int(suffix)  # non-numeric suffixes are invalid
        return f"{prefix}:{suffix}"
    except (IndexError, ValueError):
        raise InvalidArgError(
            f"Given device `{device}` isn't  a known device type. "
            f"Acceptable device types: {ACCEPTABLE_DEVICES}")


def validate_api_device_string(device: Optional[str]) -> Optional[str]:
    """Validate (without translating) an API device string (reference
    web/api_validation.py:10-46 validate_api_device_string: non-strings
    and colon forms are InvalidArgError; valid forms return unchanged)."""
    if device is None:
        return device
    if not isinstance(device, str):
        raise InvalidArgError(
            f"Device must be a str! Given "
            f"device `{device}` of type {type(device).__name__}")
    lowered = device.lower()
    for acceptable in ACCEPTABLE_DEVICES:
        if lowered.startswith(acceptable):
            suffix = lowered.replace(acceptable, "", 1)
            if not suffix or suffix.isdigit():
                return device
            break
    raise InvalidArgError(
        f"Given device `{device}` isn't  a known device type. "
        f"Acceptable device types: {ACCEPTABLE_DEVICES}")


def decode_image_download_headers(image_download_headers: Optional[str]
                                  = None) -> dict:
    """URL-encoded JSON dict -> dict; empty -> {} (reference :53-73)."""
    if not image_download_headers:
        return dict()
    try:
        as_str = urllib.parse.unquote_plus(image_download_headers)
        return json.loads(as_str)
    except json.JSONDecodeError as e:
        raise InvalidArgError(
            f"Error parsing image_download_headers. Message: {e}")


def decode_query_string_model_auth(model_auth: Optional[str] = None):
    """URL-encoded JSON ModelAuth -> ModelAuth object, None/"" -> None;
    invalid payloads raise pydantic.ValidationError (reference :76-97)."""
    if not model_auth:
        return None
    from marqo_tpu.api.models.requests import ModelAuth
    as_str = urllib.parse.unquote_plus(model_auth)
    return ModelAuth.model_validate_json(as_str)
