"""s3 model auth without boto3: stdlib SigV4 signer + download flow
(reference downloads private checkpoints from S3 via boto3; this image has
no boto3, so inference/s3_sigv4.py implements the one needed operation)."""

import datetime
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from marqo_tpu.core.exceptions import ModelDownloadError
from marqo_tpu.inference.s3_sigv4 import EMPTY_SHA256, sign_request


class TestSigV4Vectors:
    def test_aws_test_suite_get_vanilla(self):
        """The AWS SigV4 test suite's get-vanilla case: fixed credentials,
        date, host — expected signature is published by AWS."""
        ts = datetime.datetime(2015, 8, 30, 12, 36, 0,
                               tzinfo=datetime.timezone.utc)
        headers = sign_request(
            "GET", "example.amazonaws.com", "/",
            access_key="AKIDEXAMPLE",
            secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            region="us-east-1", service="service", timestamp=ts,
            payload_hash=EMPTY_SHA256)
        assert headers["X-Amz-Date"] == "20150830T123600Z"
        auth = headers["Authorization"]
        assert auth.startswith(
            "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/"
            "service/aws4_request, SignedHeaders=host;x-amz-date, ")
        assert auth.endswith(
            "Signature=5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d"
            "9b8aae1d763fbf31")

    def test_session_token_is_signed(self):
        ts = datetime.datetime(2015, 8, 30, 12, 36, 0,
                               tzinfo=datetime.timezone.utc)
        headers = sign_request("GET", "h.example.com", "/b/k", "AK", "SK",
                               session_token="TOKEN", timestamp=ts)
        assert headers["X-Amz-Security-Token"] == "TOKEN"
        assert "x-amz-security-token" in headers["Authorization"]


class _FakeS3(BaseHTTPRequestHandler):
    payload = b"fake-model-weights-bytes"
    requests_seen = []

    def do_GET(self):
        type(self).requests_seen.append(
            {"path": self.path,
             "authorization": self.headers.get("Authorization", ""),
             "amz_date": self.headers.get("X-Amz-Date", "")})
        # presigned-URL flow: SigV4 signature rides the query string
        if "X-Amz-Signature=" not in self.path:
            self.send_response(403)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.payload)))
        self.end_headers()
        self.wfile.write(self.payload)

    def log_message(self, *args):
        pass


@pytest.fixture
def fake_s3():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeS3)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    _FakeS3.requests_seen = []
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


class TestS3Download:
    def test_download_via_stdlib_signer(self, fake_s3, tmp_path,
                                        monkeypatch):
        import marqo_tpu.inference.model_download as md
        monkeypatch.setattr(md.ModelCache, "clip_cache_path",
                            str(tmp_path))
        monkeypatch.setenv("MARQO_S3_ENDPOINT", fake_s3)
        path = md.download_model(
            repo_location={"s3": {"Bucket": "models",
                                  "Key": "weights/model.bin"}},
            auth={"s3": {"aws_access_key_id": "AK",
                         "aws_secret_access_key": "SK"}})
        with open(path, "rb") as f:
            assert f.read() == _FakeS3.payload
        seen = _FakeS3.requests_seen[-1]
        # presigned query-string auth (reference get_presigned_s3_url)
        assert seen["path"].startswith("/models/weights/model.bin?")
        assert "X-Amz-Credential=AK%2F" in seen["path"]
        assert "X-Amz-Signature=" in seen["path"]
        # second call is served from the on-disk cache: no new request
        before = len(_FakeS3.requests_seen)
        again = md.download_model(
            repo_location={"s3": {"Bucket": "models",
                                  "Key": "weights/model.bin"}},
            auth={"s3": {"aws_access_key_id": "AK",
                         "aws_secret_access_key": "SK"}})
        assert again == path
        assert len(_FakeS3.requests_seen) == before

    def test_missing_credentials_clear_error(self, tmp_path, monkeypatch):
        import marqo_tpu.inference.model_download as md
        monkeypatch.setattr(md.ModelCache, "clip_cache_path",
                            str(tmp_path))
        for var in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"):
            monkeypatch.delenv(var, raising=False)
        # reference download_model_from_s3.py:24-27 wording
        with pytest.raises(ModelDownloadError,
                           match="AWS credentials were not accepted"):
            md.download_model(
                repo_location={"s3": {"Bucket": "b", "Key": "k"}})

    def test_unreachable_endpoint_wrapped(self, tmp_path, monkeypatch):
        import marqo_tpu.inference.model_download as md
        monkeypatch.setattr(md.ModelCache, "clip_cache_path",
                            str(tmp_path))
        monkeypatch.setenv("MARQO_S3_ENDPOINT", "http://127.0.0.1:1")
        with pytest.raises(ModelDownloadError, match="Could not download"):
            md.download_model(
                repo_location={"s3": {"Bucket": "b", "Key": "k"}},
                auth={"s3": {"aws_access_key_id": "AK",
                             "aws_secret_access_key": "SK"}})
