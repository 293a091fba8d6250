"""Ported reference tests: the model-download function decomposition.

Sources:
/root/reference/tests/core/inference/test_download_model.py (12),
/root/reference/tests/core/inference/test_download_model_from_s3.py (10),
/root/reference/tests/core/inference/test_download_mode_from_hf.py (9),
/root/reference/tests/tensor_search/models/test_private_models.py (8).

Adaptations (no boto3 in this image): get_presigned_s3_url uses the
stdlib SigV4 presigner; missing credentials raise the reference's
"AWS credentials were not accepted" ModelDownloadError, and an empty
Bucket/Key raises InvalidArgumentError in place of botocore's
ParamValidationError.
"""

import urllib.error
from unittest.mock import patch

import pytest

from marqo_tpu.core.exceptions import (InvalidArgumentError,
                                       ModelDownloadError)
from marqo_tpu.inference import model_download as md
from marqo_tpu.inference.download_model_from_hf import download_model_from_hf
from marqo_tpu.inference.download_model_from_s3 import (
    check_s3_model_already_exists, get_presigned_s3_url,
    get_s3_model_absolute_cache_path, get_s3_model_cache_filename)
from marqo_tpu.inference.model_download import (InvalidModelPropertiesError,
                                                ModelCache, download_model,
                                                download_pretrained_from_s3)

S3_LOCATION = {"Bucket": "test_bucket", "Key": "remote_path/test_key.pt"}
S3_AUTH = {"aws_access_key_id": "test_access_key",
           "aws_secret_access_key": "test_secret_key"}


class TestDownloadModel:
    """reference test_download_model.py TestDownloadModel"""

    def test_both_location_and_url_provided(self):
        with pytest.raises(InvalidModelPropertiesError):
            download_model(
                repo_location={"s3": {"Bucket": "test_bucket",
                                      "Key": "test_key"}},
                url="http://example.com/model.pt")

    def test_neither_location_nor_url_provided(self):
        with pytest.raises(InvalidModelPropertiesError):
            download_model()

    def test_download_from_s3(self):
        with patch("marqo_tpu.inference.model_download."
                   "download_pretrained_from_s3",
                   return_value="/path/to/model.pt") as mock_s3:
            with patch.object(md, "_maybe_extract", side_effect=lambda p: p):
                path = download_model(
                    repo_location={"s3": S3_LOCATION},
                    auth={"s3": S3_AUTH})
        assert path == "/path/to/model.pt"
        mock_s3.assert_called_once_with(location=S3_LOCATION, auth=S3_AUTH,
                                        download_dir=None)

    def test_download_from_url(self):
        with patch("marqo_tpu.inference.model_download."
                   "download_pretrained_from_url",
                   return_value="/path/to/model.pt") as mock_url:
            path = download_model(url="http://example.com/model.pt")
        assert path == "/path/to/model.pt"
        mock_url.assert_called_once_with(url="http://example.com/model.pt",
                                         cache_dir=None)


class TestDownloadPretrainedFromS3:
    """reference test_download_model.py TestDownloadPretrainedFromS3"""

    def test_model_exists_locally(self):
        with patch("marqo_tpu.inference.model_download."
                   "check_s3_model_already_exists", create=True) as _:
            pass  # placeholder to mirror the reference patch style
        with patch("marqo_tpu.inference.download_model_from_s3."
                   "check_s3_model_already_exists",
                   return_value=True) as mock_check:
            with patch("marqo_tpu.inference.download_model_from_s3."
                       "get_s3_model_absolute_cache_path",
                       return_value="/path/to/model.pt"):
                with patch("marqo_tpu.inference.model_download."
                           "download_pretrained_from_url") as mock_dl:
                    with patch.object(md, "_maybe_extract",
                                      side_effect=lambda p: p):
                        result = download_pretrained_from_s3(
                            location=S3_LOCATION, auth=S3_AUTH)
        assert result == "/path/to/model.pt"
        mock_dl.assert_not_called()
        mock_check.assert_called_once_with(location=S3_LOCATION,
                                           download_dir=None)

    def test_model_does_not_exist_locally(self):
        with patch("marqo_tpu.inference.download_model_from_s3."
                   "check_s3_model_already_exists", return_value=False):
            with patch("marqo_tpu.inference.download_model_from_s3."
                       "get_presigned_s3_url",
                       return_value="http://example.com/model.pt"
                       ) as mock_presign:
                with patch("marqo_tpu.inference.model_download."
                           "download_pretrained_from_url",
                           return_value="/path/to/model.pt") as mock_dl:
                    result = download_pretrained_from_s3(
                        location=S3_LOCATION, auth=S3_AUTH)
        assert result == "/path/to/model.pt"
        mock_presign.assert_called_once_with(location=S3_LOCATION,
                                             auth=S3_AUTH)
        # the cache file name comes from the KEY, not the URL
        mock_dl.assert_called_once_with(url="http://example.com/model.pt",
                                        cache_dir=None,
                                        cache_file_name="test_key.pt",
                                        raise_http_errors=True)

    def test_model_download_raises_403_error(self):
        with patch("marqo_tpu.inference.download_model_from_s3."
                   "check_s3_model_already_exists", return_value=False):
            with patch("marqo_tpu.inference.download_model_from_s3."
                       "get_presigned_s3_url",
                       return_value="http://example.com/model.pt"):
                with patch("marqo_tpu.inference.model_download."
                           "download_pretrained_from_url",
                           side_effect=urllib.error.HTTPError(
                               url=None, code=403, msg=None, hdrs=None,
                               fp=None)):
                    with pytest.raises(ModelDownloadError):
                        download_pretrained_from_s3(location=S3_LOCATION,
                                                    auth=S3_AUTH)


class TestS3Helpers:
    """reference test_download_model_from_s3.py TestModelAuthEdgeCases"""

    def test_get_presigned_s3_url_no_credentials_error(self, monkeypatch):
        for var in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"):
            monkeypatch.delenv(var, raising=False)
        with pytest.raises(ModelDownloadError,
                           match="AWS credentials were not accepted"):
            get_presigned_s3_url({"Bucket": "test-bucket",
                                  "Key": "test-key"}, None)

    def test_get_presigned_s3_url_invalid_location(self):
        # reference: botocore ParamValidationError; adapted to the native
        # InvalidArgumentError (PARITY.md round-4)
        with pytest.raises(InvalidArgumentError):
            get_presigned_s3_url({"Bucket": "", "Key": ""},
                                 S3_AUTH)

    def test_get_presigned_s3_url_contains_signature(self):
        url = get_presigned_s3_url(
            {"Bucket": "test-bucket", "Key": "models/test-key"}, S3_AUTH)
        assert "X-Amz-Signature=" in url
        assert "X-Amz-Credential=test_access_key%2F" in url
        assert "X-Amz-Algorithm=AWS4-HMAC-SHA256" in url

    def test_get_s3_model_absolute_cache_path_empty_key(self):
        with patch("os.path.expanduser", return_value="some_cache_path"):
            result = get_s3_model_absolute_cache_path(
                {"Bucket": "test-bucket", "Key": ""})
        assert result == "some_cache_path/"

    def test_check_s3_model_already_exists_empty_key(self):
        with patch("os.path.isfile", return_value=True):
            assert check_s3_model_already_exists(
                {"Bucket": "test-bucket", "Key": ""}) is True

    def test_check_s3_model_already_exists_no_file(self):
        with patch("os.path.isfile", return_value=False):
            assert check_s3_model_already_exists(
                {"Bucket": "test-bucket", "Key": "test-key"}) is False

    def test_get_s3_model_cache_filename_empty_key(self):
        assert get_s3_model_cache_filename(
            {"Bucket": "test-bucket", "Key": ""}) == ""

    def test_get_s3_model_absolute_cache_path_invalid_cache_dir(self):
        with patch("os.path.expanduser", return_value=""):
            result = get_s3_model_absolute_cache_path(
                {"Bucket": "test-bucket", "Key": "test-key"})
        assert result == "test-key"

    def test_get_s3_model_absolute_cache_path_cache_dir_not_expanded(self):
        with patch("os.path.expanduser", side_effect=lambda x: x):
            result = get_s3_model_absolute_cache_path(
                {"Bucket": "test-bucket", "Key": "test-key"})
        assert result == \
            f"{ModelCache.clip_cache_path}/test-key".replace("//", "/")

    def test_check_s3_model_already_exists_os_error(self):
        with patch("os.path.isfile", side_effect=OSError("Test OSError")):
            with pytest.raises(OSError):
                check_s3_model_already_exists(
                    {"Bucket": "test-bucket", "Key": "test-key"})

    def test_get_s3_model_cache_filename_with_directory(self):
        assert get_s3_model_cache_filename(
            {"Bucket": "test-bucket", "Key": "models/test-key"}) == \
            "test-key"


HF_LOCATION = {"repo_id": "test-repo-id", "filename": "test-filename"}
HF_AUTH = {"token": "test-token"}


class TestDownloadModelFromHF:
    """reference test_download_mode_from_hf.py"""

    def test_success(self):
        with patch("huggingface_hub.hf_hub_download",
                   return_value="model_path") as mock_hf:
            result = download_model_from_hf(HF_LOCATION, HF_AUTH)
        assert result == "model_path"
        mock_hf.assert_called_once_with(repo_id="test-repo-id",
                                        filename="test-filename",
                                        token="test-token", cache_dir=None)

    def test_no_auth(self):
        with patch("huggingface_hub.hf_hub_download",
                   return_value="model_path") as mock_hf:
            result = download_model_from_hf(HF_LOCATION)
        assert result == "model_path"
        mock_hf.assert_called_once_with(repo_id="test-repo-id",
                                        filename="test-filename",
                                        cache_dir=None)

    def test_repository_not_found_error(self):
        from huggingface_hub.errors import RepositoryNotFoundError
        with patch("huggingface_hub.hf_hub_download",
                   side_effect=RepositoryNotFoundError("repo not found")):
            with pytest.raises(ModelDownloadError):
                download_model_from_hf(HF_LOCATION, HF_AUTH)

    def test_invalid_location(self):
        from huggingface_hub.errors import RepositoryNotFoundError
        with patch("huggingface_hub.hf_hub_download",
                   side_effect=RepositoryNotFoundError("repo not found")):
            with pytest.raises(ModelDownloadError):
                download_model_from_hf(
                    {"repo_id": "", "filename": "test-filename"}, HF_AUTH)

    def test_unexpected_error_propagates(self):
        with patch("huggingface_hub.hf_hub_download",
                   side_effect=Exception("Unexpected error")):
            with pytest.raises(Exception, match="Unexpected error"):
                download_model_from_hf(HF_LOCATION, HF_AUTH)

    def test_with_download_dir(self):
        with patch("huggingface_hub.hf_hub_download",
                   return_value="model_path") as mock_hf:
            result = download_model_from_hf(
                HF_LOCATION, HF_AUTH, download_dir="custom_download_dir")
        assert result == "model_path"
        mock_hf.assert_called_once_with(repo_id="test-repo-id",
                                        filename="test-filename",
                                        token="test-token",
                                        cache_dir="custom_download_dir")

    def test_no_auth_with_hf_dir(self):
        with patch("huggingface_hub.hf_hub_download",
                   return_value="model_path") as mock_hf:
            result = download_model_from_hf(
                HF_LOCATION, download_dir=ModelCache.hf_cache_path)
        assert result == "model_path"
        mock_hf.assert_called_once_with(repo_id="test-repo-id",
                                        filename="test-filename",
                                        cache_dir=ModelCache.hf_cache_path)

    def test_no_auth_with_openclip_dir(self):
        with patch("huggingface_hub.hf_hub_download",
                   return_value="model_path") as mock_hf:
            result = download_model_from_hf(
                HF_LOCATION, download_dir=ModelCache.clip_cache_path)
        assert result == "model_path"
        mock_hf.assert_called_once_with(
            repo_id="test-repo-id", filename="test-filename",
            cache_dir=ModelCache.clip_cache_path)


class TestPrivateModelsValidation:
    """reference tensor_search/models/test_private_models.py — ModelAuth
    and ModelLocation pydantic validation."""

    def test_no_auth(self):
        from marqo_tpu.api.exceptions import InvalidArgError
        from marqo_tpu.api.models.requests import ModelAuth
        with pytest.raises(InvalidArgError):
            ModelAuth()

    def test_multiple_auth_accepted(self):
        # v2.13 accepts both together (PARITY.md row 52)
        from marqo_tpu.api.models.requests import ModelAuth
        auth = ModelAuth(s3={"aws_access_key_id": "a",
                             "aws_secret_access_key": "b"},
                         hf={"token": "c"})
        assert auth.s3 and auth.hf

    def test_s3_auth(self):
        from marqo_tpu.api.models.requests import ModelAuth
        auth = ModelAuth(s3={"aws_access_key_id": "a",
                             "aws_secret_access_key": "b"})
        assert auth.hf is None

    def test_hf_auth(self):
        from marqo_tpu.api.models.requests import ModelAuth
        auth = ModelAuth(hf={"token": "c"})
        assert auth.s3 is None

    def test_location_validation(self):
        # model_location with neither s3 nor hf fails at download time
        with pytest.raises(InvalidArgumentError):
            download_model(repo_location={"auth_required": True})
