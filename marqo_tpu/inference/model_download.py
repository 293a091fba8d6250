"""Private-model download with auth (s3 / HF hub).

Parity: reference core/inference/model_download.py + tensor_search/models/
private_models.py:13-38 — ModelAuth carries exactly one of {s3, hf}
credentials; ModelLocation points at an s3 object or HF repo. Downloads are
cached on disk (reference ModelCache paths / HF hub cache); archive
checkpoints extract next to the download. S3 uses boto3 when installed and
falls back to the stdlib SigV4 signer (s3_sigv4.py) otherwise.
"""

import os
from typing import Any, Dict, Optional

from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       ModelDownloadError)

CACHE_DIR = os.environ.get("MARQO_MODEL_CACHE_DIR",
                           os.path.expanduser("~/.cache/marqo_tpu/models"))


def field_of(obj, name: str):
    """dict-or-attribute accessor for location/auth objects (dicts from
    model_properties, or pydantic-style objects) — the one shared copy
    used by download_model and the s3/hf helper modules."""
    if isinstance(obj, dict):
        return obj.get(name)
    return getattr(obj, name, None)


class ModelCache:
    """Cache directory layout (reference s2_inference/configs.py
    ModelCache — clip checkpoints and HF snapshots cache separately;
    CLIP_SAVE_PATH overrides like the reference's env var)."""
    clip_cache_path = os.environ.get("CLIP_SAVE_PATH",
                                     os.path.join(CACHE_DIR, "clip"))
    hf_cache_path = os.environ.get("HF_SAVE_PATH",
                                   os.path.join(CACHE_DIR, "hf"))


def validate_model_auth(model_auth: Optional[Dict[str, Any]]) -> None:
    """At least one of s3/hf; both together is accepted (reference
    private_models.py:21-26 errors only when BOTH are missing)."""
    if model_auth is None:
        return
    if model_auth.get("s3") is None and model_auth.get("hf") is None:
        raise InvalidArgumentError(
            "Missing authentication object. An authentic object, for "
            "example `s3` or  `hf`, must be provided. ")


def auth_for_location(model_location: Dict[str, Any],
                      model_auth: Optional[Dict[str, Any]]
                      ) -> Optional[Dict[str, Any]]:
    """Loaders forward credentials only when the location demands them
    (reference clip_utils.py:335-337, open_clip_model.py:239-241) — a
    stray token must not break public downloads."""
    return model_auth if model_location.get("auth_required") else None


def download_model(repo_location=None, url: Optional[str] = None,
                   auth=None, download_dir: Optional[str] = None) -> str:
    """Resolve a checkpoint location to a local directory/file path
    (reference model_download.py:20-61 download_model — exactly one of
    repo_location/url; s3 goes through the presigned-URL flow, hf
    through download_model_from_hf).

    repo_location forms (reference ModelLocation, private_models.py:38):
      {"s3": {"Bucket": ..., "Key": ...}, "auth_required": bool}
      {"hf": {"repo_id": ..., "filename": optional}, "auth_required": bool}
    auth: {"s3": {...}} / {"hf": {"token": ...}} dict (or None).
    """
    single_weight_location_validation_msg = (
        "only exactly one of parameters (repo_location, url) is allowed "
        "to be specified.")
    if repo_location is None and url is None:
        raise InvalidModelPropertiesError(
            single_weight_location_validation_msg)
    if repo_location is not None and url is not None:
        raise InvalidModelPropertiesError(
            single_weight_location_validation_msg)
    if url:
        return download_pretrained_from_url(url=url, cache_dir=download_dir)
    validate_model_auth(auth if isinstance(auth, dict) else None)
    os.makedirs(CACHE_DIR, exist_ok=True)
    loc_s3 = field_of(repo_location, "s3")
    loc_hf = field_of(repo_location, "hf")
    auth_s3 = field_of(auth, "s3") if auth is not None else None
    auth_hf = field_of(auth, "hf") if auth is not None else None
    if loc_s3:
        return download_pretrained_from_s3(location=loc_s3, auth=auth_s3,
                                           download_dir=download_dir)
    if loc_hf:
        from marqo_tpu.inference.download_model_from_hf import \
            download_model_from_hf
        return _maybe_extract(download_model_from_hf(
            location=loc_hf, auth=auth_hf, download_dir=download_dir))
    raise InvalidArgumentError(
        "model_location must specify one of `s3` or `hf`")


class InvalidModelPropertiesError(InvalidArgumentError):
    """Reference s2_inference/errors.py InvalidModelPropertiesError —
    a 400 at the API boundary."""


def download_pretrained_from_s3(location, auth=None,
                                download_dir: Optional[str] = None) -> str:
    """Reference model_download.py:64-101: serve from the Key-basename
    cache when present, else presign + download; a 403 on the download
    is the credentials error with the reference's exact wording."""
    from urllib.error import HTTPError

    from marqo_tpu.inference.download_model_from_s3 import (
        check_s3_model_already_exists, get_presigned_s3_url,
        get_s3_model_absolute_cache_path, get_s3_model_cache_filename)
    if check_s3_model_already_exists(location=location,
                                     download_dir=download_dir):
        return _maybe_extract(get_s3_model_absolute_cache_path(
            location=location, download_dir=download_dir))
    url = get_presigned_s3_url(location=location, auth=auth)
    try:
        return download_pretrained_from_url(
            url=url, cache_dir=download_dir,
            cache_file_name=get_s3_model_cache_filename(location),
            raise_http_errors=True)
    except HTTPError as e:
        if e.code == 403:
            # reference model_download.py:93-97
            raise ModelDownloadError(
                "Received 403 error when trying to retrieve model from s3 "
                "storage. Please check the request's s3 credentials and "
                "try again. ") from e
        raise


def download_pretrained_from_url(url: str,
                                 cache_dir: Optional[str] = None,
                                 cache_file_name: Optional[str] = None,
                                 raise_http_errors: bool = False) -> str:
    """Public checkpoint URL download, cached by basename (reference
    core/inference/model_download.py:102-140 download_pretrained_from_url).
    Archives extract next to the download (the reference extracts via its
    ModelCache); callers get the file or extracted directory."""
    import urllib.request
    from urllib.error import HTTPError
    cache_dir = os.path.expanduser(cache_dir or ModelCache.clip_cache_path)
    os.makedirs(cache_dir, exist_ok=True)
    filename = cache_file_name or os.path.basename(
        url.split("?")[0]) or "model.bin"
    target = os.path.join(cache_dir, filename)
    if os.path.isfile(target) or os.path.isdir(target + ".extracted"):
        return _maybe_extract(target)
    tmp = target + ".tmp"
    try:
        with urllib.request.urlopen(url, timeout=300.0) as response, \
                open(tmp, "wb") as f:
            while True:
                chunk = response.read(8192)
                if not chunk:
                    break
                f.write(chunk)
    except HTTPError as e:
        if raise_http_errors:
            # download_pretrained_from_s3 maps 403 to the credentials
            # error (reference model_download.py:91-101)
            raise
        raise ModelDownloadError(
            f"Could not download model from url `{url}`: {e}") from e
    except Exception as e:
        raise ModelDownloadError(
            f"Could not download model from url `{url}`: {e}") from e
    os.replace(tmp, target)
    return _maybe_extract(target)


def _maybe_extract(path: str) -> str:
    """Checkpoint archives (the reference ships s3 models as zip/tar,
    extracted by its ModelCache) unpack next to the download; loaders get
    the directory."""
    import tarfile
    import zipfile

    def _resolve(out_dir: str) -> str:
        # single top-level dir inside the archive → use it directly; must
        # apply on the cached branch too, else a RELOAD from cache points
        # one level too high and the checkpoint is unreadable
        entries = os.listdir(out_dir)
        if len(entries) == 1 and \
                os.path.isdir(os.path.join(out_dir, entries[0])):
            return os.path.join(out_dir, entries[0])
        return out_dir

    out_dir = path + ".extracted"
    if os.path.isdir(out_dir):
        return _resolve(out_dir)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            zf.extractall(out_dir)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as tf:
            tf.extractall(out_dir, filter="data")
    else:
        return path
    return _resolve(out_dir)
