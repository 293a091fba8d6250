"""Minimal AWS Signature Version 4 signer for S3 GETs — stdlib only.

Why: the reference downloads private model checkpoints from S3 via boto3
(core/inference/download_model_from_s3.py role); boto3 is not baked into
this image, and a GET of one object needs only the SigV4 algorithm
(canonical request → string-to-sign → HMAC chain → Authorization header),
which is ~60 lines of hashlib/hmac. Verified against the AWS SigV4 test
suite's get-vanilla vector.
"""

import datetime
import hashlib
import hmac
import urllib.parse
from typing import Dict, Optional

EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _uri_encode(value: str, encode_slash: bool = True) -> str:
    safe = "-_.~" if encode_slash else "-_.~/"
    return urllib.parse.quote(value, safe=safe)


def signing_key(secret_key: str, date: str, region: str,
                service: str) -> bytes:
    k = _hmac(("AWS4" + secret_key).encode("utf-8"), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign_request(method: str, host: str, path: str,
                 access_key: str, secret_key: str,
                 session_token: Optional[str] = None,
                 region: str = "us-east-1", service: str = "s3",
                 query: Optional[Dict[str, str]] = None,
                 payload_hash: str = EMPTY_SHA256,
                 timestamp: Optional[datetime.datetime] = None
                 ) -> Dict[str, str]:
    """Returns the headers (Host, X-Amz-Date, [X-Amz-Security-Token],
    x-amz-content-sha256, Authorization) for a signed request."""
    now = timestamp or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date = now.strftime("%Y%m%d")

    headers = {"host": host, "x-amz-date": amz_date}
    if service == "s3":
        headers["x-amz-content-sha256"] = payload_hash
    if session_token:
        headers["x-amz-security-token"] = session_token

    canonical_path = _uri_encode(path or "/", encode_slash=False)
    query_items = sorted((query or {}).items())
    canonical_query = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}" for k, v in query_items)
    signed_header_names = sorted(headers)
    canonical_headers = "".join(
        f"{name}:{headers[name].strip()}\n" for name in signed_header_names)
    signed_headers = ";".join(signed_header_names)
    canonical_request = "\n".join([
        method.upper(), canonical_path, canonical_query, canonical_headers,
        signed_headers, payload_hash])

    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical_request.encode("utf-8")).hexdigest()])
    signature = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign.encode("utf-8"), hashlib.sha256).hexdigest()

    authorization = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}")
    out = {"Host": host, "X-Amz-Date": amz_date,
           "Authorization": authorization}
    if service == "s3":
        out["x-amz-content-sha256"] = payload_hash
    if session_token:
        out["X-Amz-Security-Token"] = session_token
    return out


def presign_url(bucket: str, key: str, access_key: str, secret_key: str,
                session_token: Optional[str] = None,
                region: str = "us-east-1",
                endpoint: Optional[str] = None,
                expires: int = 3600,
                timestamp: Optional[datetime.datetime] = None) -> str:
    """SigV4 presigned GET URL (query-string auth) — the native stand-in
    for boto3's generate_presigned_url('get_object') that the reference
    uses (download_model_from_s3.py:10-28). Payload hash is
    UNSIGNED-PAYLOAD per the AWS presign spec."""
    now = timestamp or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date = now.strftime("%Y%m%d")
    if endpoint:
        base = endpoint.rstrip("/")
        host = urllib.parse.urlparse(base).netloc
        path = f"/{bucket}/{key}"
        url_base = f"{base}/{bucket}/{urllib.parse.quote(key)}"
    else:
        host = (f"{bucket}.s3.amazonaws.com" if region == "us-east-1"
                else f"{bucket}.s3.{region}.amazonaws.com")
        path = f"/{key}"
        url_base = f"https://{host}/{urllib.parse.quote(key)}"
    scope = f"{date}/{region}/s3/aws4_request"
    query = {
        "X-Amz-Algorithm": "AWS4-HMAC-SHA256",
        "X-Amz-Credential": f"{access_key}/{scope}",
        "X-Amz-Date": amz_date,
        "X-Amz-Expires": str(expires),
        "X-Amz-SignedHeaders": "host",
    }
    if session_token:
        query["X-Amz-Security-Token"] = session_token
    canonical_query = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}"
        for k, v in sorted(query.items()))
    canonical_request = "\n".join([
        "GET", _uri_encode(path, encode_slash=False), canonical_query,
        f"host:{host}\n", "host", "UNSIGNED-PAYLOAD"])
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical_request.encode("utf-8")).hexdigest()])
    signature = hmac.new(
        signing_key(secret_key, date, region, "s3"),
        string_to_sign.encode("utf-8"), hashlib.sha256).hexdigest()
    return f"{url_base}?{canonical_query}&X-Amz-Signature={signature}"


def s3_get(bucket: str, key: str, access_key: str, secret_key: str,
           session_token: Optional[str] = None,
           region: str = "us-east-1",
           endpoint: Optional[str] = None, timeout: float = 300.0) -> bytes:
    """Signed GET of one S3 object. `endpoint` overrides the AWS host
    (tests / S3-compatible stores)."""
    import urllib.request
    if endpoint:
        base = endpoint.rstrip("/")
        host = urllib.parse.urlparse(base).netloc
        url = f"{base}/{bucket}/{urllib.parse.quote(key)}"
        path = f"/{bucket}/{key}"
    else:
        host = (f"{bucket}.s3.amazonaws.com" if region == "us-east-1"
                else f"{bucket}.s3.{region}.amazonaws.com")
        url = f"https://{host}/{urllib.parse.quote(key)}"
        path = f"/{key}"
    headers = sign_request("GET", host, path, access_key, secret_key,
                           session_token=session_token, region=region)
    request = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(request, timeout=timeout) as response:
        return response.read()
