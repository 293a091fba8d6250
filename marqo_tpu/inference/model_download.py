"""Private-model download with auth (s3 / HF hub).

Parity: reference core/inference/model_download.py + tensor_search/models/
private_models.py:13-38 — ModelAuth carries exactly one of {s3, hf}
credentials; ModelLocation points at an s3 object or HF repo. Downloads are
cached on disk (reference ModelCache paths / HF hub cache). boto3 is not
baked into this image, so the s3 path is import-gated with a clear error.
"""

import os
from typing import Any, Dict, Optional

from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       ModelDownloadError)

CACHE_DIR = os.environ.get("MARQO_MODEL_CACHE_DIR",
                           os.path.expanduser("~/.cache/marqo_tpu/models"))


def validate_model_auth(model_auth: Optional[Dict[str, Any]]) -> None:
    """Exactly one of s3/hf (reference private_models.py:13-35)."""
    if model_auth is None:
        return
    provided = [k for k in ("s3", "hf") if model_auth.get(k) is not None]
    if len(provided) != 1:
        raise InvalidArgumentError(
            "Exactly one model auth provider (s3 or hf) must be set, got "
            f"{provided or 'none'}")


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


def _download_s3(location: Dict[str, Any],
                 auth: Optional[Dict[str, Any]]) -> str:
    try:
        import boto3  # optional: not baked into every image
    except ImportError:
        raise ModelDownloadError(
            "s3 model downloads require boto3, which is not installed in "
            "this deployment. Host the checkpoint on the HF hub or a local "
            "path instead.")
    bucket, key = location.get("Bucket"), location.get("Key")
    if not bucket or not key:
        raise InvalidArgumentError("s3 model_location needs Bucket and Key")
    target = os.path.join(CACHE_DIR, "s3", bucket, key.replace("/", "_"))
    if os.path.exists(target):
        return target
    os.makedirs(os.path.dirname(target), exist_ok=True)
    kwargs = {}
    if auth:
        kwargs = dict(
            aws_access_key_id=auth.get("aws_access_key_id"),
            aws_secret_access_key=auth.get("aws_secret_access_key"),
            aws_session_token=auth.get("aws_session_token"))
    try:
        client = boto3.client("s3", **kwargs)
        client.download_file(bucket, key, target)
    except Exception as e:
        raise ModelDownloadError(
            f"Could not download s3://{bucket}/{key}: {e}") from e
    return target


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
