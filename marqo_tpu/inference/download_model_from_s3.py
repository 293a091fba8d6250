"""S3 checkpoint-location helpers, reference-shaped.

Parity: reference core/inference/download_model_from_s3.py — presigned
GET URL generation plus the Key-basename cache-path helpers. boto3 is
not in this image, so get_presigned_s3_url uses the stdlib SigV4
presigner (s3_sigv4.presign_url); a missing-credentials presign raises
the reference's ModelDownloadError, and an empty Bucket/Key raises
InvalidArgumentError (the native stand-in for botocore's
ParamValidationError).
"""

import os
from typing import Optional

from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       ModelDownloadError)


from marqo_tpu.inference.model_download import field_of as _field


def get_presigned_s3_url(location, auth=None) -> str:
    """Presigned GET URL for an S3 object (reference
    download_model_from_s3.py:10-28). location carries Bucket/Key; auth
    carries aws_access_key_id/aws_secret_access_key[/aws_session_token]."""
    bucket, key = _field(location, "Bucket"), _field(location, "Key")
    if not bucket or not key:
        # reference: botocore.exceptions.ParamValidationError
        raise InvalidArgumentError(
            f"Invalid s3 location: Bucket and Key must be non-empty "
            f"(got Bucket={bucket!r}, Key={key!r})")
    access_key = _field(auth, "aws_access_key_id") if auth else None
    secret_key = _field(auth, "aws_secret_access_key") if auth else None
    session_token = _field(auth, "aws_session_token") if auth else None
    access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID")
    secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY")
    session_token = session_token or os.environ.get("AWS_SESSION_TOKEN")
    if not access_key or not secret_key:
        # reference wording (download_model_from_s3.py:24-27)
        raise ModelDownloadError(
            "Error retrieving private model. AWS credentials were not "
            "accepted.")
    from marqo_tpu.inference.s3_sigv4 import presign_url
    region = (_field(auth, "region") if auth else None) or \
        os.environ.get("AWS_REGION") or "us-east-1"
    return presign_url(bucket, key, access_key, secret_key,
                       session_token=session_token, region=region,
                       endpoint=os.environ.get("MARQO_S3_ENDPOINT"))


def get_s3_model_cache_filename(location) -> str:
    """basename of the Key (reference :58-67)."""
    return os.path.basename(_field(location, "Key") or "")


def get_s3_model_absolute_cache_path(location,
                                     download_dir: Optional[str] = None
                                     ) -> str:
    """Absolute cache path an s3 model would download to (reference
    :31-42 — expanduser(download_dir or ModelCache.clip_cache_path))."""
    from marqo_tpu.inference.model_download import ModelCache
    cache_dir = os.path.expanduser(
        download_dir if download_dir is not None
        else ModelCache.clip_cache_path)
    return os.path.join(cache_dir, get_s3_model_cache_filename(location))


def check_s3_model_already_exists(location,
                                  download_dir: Optional[str] = None
                                  ) -> bool:
    """True iff the cache file exists (reference :45-55; OSErrors from
    isfile propagate)."""
    return os.path.isfile(
        get_s3_model_absolute_cache_path(location, download_dir))
