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


def download_model(model_location: Dict[str, Any],
                   model_auth: Optional[Dict[str, Any]] = None) -> str:
    """Resolve a model_location to a local directory/file path.

    model_location forms (reference ModelLocation, private_models.py:38):
      {"s3": {"Bucket": ..., "Key": ...}, "auth_required": bool}
      {"hf": {"repo_id": ..., "filename": optional}, "auth_required": bool}
    """
    validate_model_auth(model_auth)
    os.makedirs(CACHE_DIR, exist_ok=True)
    if model_location.get("s3"):
        return _download_s3(model_location["s3"],
                            (model_auth or {}).get("s3"))
    if model_location.get("hf"):
        return _download_hf(model_location["hf"], (model_auth or {}).get("hf"))
    raise InvalidArgumentError(
        "model_location must specify one of `s3` or `hf`")


def download_pretrained_from_url(url: str,
                                 cache_dir: Optional[str] = None,
                                 cache_file_name: Optional[str] = None
                                 ) -> str:
    """Public checkpoint URL download, cached by basename (reference
    core/inference/model_download.py:102-140 download_pretrained_from_url).
    Archives extract next to the download (the reference extracts via its
    ModelCache); callers get the file or extracted directory."""
    import urllib.request
    cache_dir = cache_dir or os.path.join(CACHE_DIR, "url")
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
    except Exception as e:
        raise ModelDownloadError(
            f"Could not download model from url `{url}`: {e}") from e
    os.replace(tmp, target)
    return _maybe_extract(target)


def _download_s3(location: Dict[str, Any],
                 auth: Optional[Dict[str, Any]]) -> str:
    """S3 object download. boto3 when present; otherwise the stdlib SigV4
    signer (inference/s3_sigv4.py) — no extra dependency needed for the
    reference's private-checkpoint flow."""
    bucket, key = location.get("Bucket"), location.get("Key")
    if not bucket or not key:
        raise InvalidArgumentError("s3 model_location needs Bucket and Key")
    target = os.path.join(CACHE_DIR, "s3", bucket, key.replace("/", "_"))
    if os.path.exists(target):
        return _maybe_extract(target)
    os.makedirs(os.path.dirname(target), exist_ok=True)
    auth = auth or {}
    access_key = auth.get("aws_access_key_id") or \
        os.environ.get("AWS_ACCESS_KEY_ID")
    secret_key = auth.get("aws_secret_access_key") or \
        os.environ.get("AWS_SECRET_ACCESS_KEY")
    session_token = auth.get("aws_session_token") or \
        os.environ.get("AWS_SESSION_TOKEN")
    region = auth.get("region") or os.environ.get("AWS_REGION") or \
        "us-east-1"
    try:
        import boto3  # preferred when available

        kwargs = {}
        if access_key:
            kwargs = dict(aws_access_key_id=access_key,
                          aws_secret_access_key=secret_key,
                          aws_session_token=session_token)
        client = boto3.client("s3", **kwargs)
        client.download_file(bucket, key, target)
        return _maybe_extract(target)
    except ImportError:
        pass
    except Exception as e:
        raise ModelDownloadError(
            f"Could not download s3://{bucket}/{key}: {e}") from e
    if not access_key or not secret_key:
        raise ModelDownloadError(
            f"s3://{bucket}/{key} needs credentials: provide model_auth.s3 "
            "(aws_access_key_id/aws_secret_access_key) or AWS_* env vars")
    from urllib.error import HTTPError

    from marqo_tpu.inference.s3_sigv4 import s3_get
    try:
        blob = s3_get(bucket, key, access_key, secret_key,
                      session_token=session_token, region=region,
                      endpoint=os.environ.get("MARQO_S3_ENDPOINT"))
    except HTTPError as e:
        if e.code == 403:
            # reference model_download.py:93-97
            raise ModelDownloadError(
                "Received 403 error when trying to retrieve model from s3 "
                "storage. Please check the request's s3 credentials and "
                "try again. ") from e
        raise ModelDownloadError(
            f"Could not download s3://{bucket}/{key}: {e}") from e
    except Exception as e:
        raise ModelDownloadError(
            f"Could not download s3://{bucket}/{key}: {e}") from e
    tmp = target + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
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


def _download_hf(location: Dict[str, Any],
                 auth: Optional[Dict[str, Any]]) -> str:
    from huggingface_hub import hf_hub_download, snapshot_download
    repo_id = location.get("repo_id")
    if not repo_id:
        raise InvalidArgumentError("hf model_location needs repo_id")
    token = (auth or {}).get("token")
    try:
        if location.get("filename"):
            return hf_hub_download(repo_id=repo_id,
                                   filename=location["filename"],
                                   token=token)
        return snapshot_download(repo_id=repo_id, token=token)
    except Exception as e:
        raise ModelDownloadError(
            f"Could not download HF repo `{repo_id}`: {e}") from e
