"""Ported reference tests: web api_utils + custom route + exception handler.

Sources:
/root/reference/tests/tensor_search/test_api_utils.py (unskipped half:
translate_api_device matrix, decode_query_string_model_auth; the
upconstruct_authorized_url / AddDocsParamsOrchestrator halves are
@unittest.skip v1-legacy upstream),
/root/reference/tests/tensor_search/test_custom_api_route.py (route-level
error logging before translation),
/root/reference/tests/tensor_search/test_api_exception_handler.py (the
base->API exception conversion matrix, asserted here through the real
app dispatch envelopes).
"""

import json
import urllib.parse

import pydantic
import pytest

from marqo_tpu import exceptions as base_exceptions
from marqo_tpu.api import api_utils
from marqo_tpu.api import exceptions as api_exceptions
from marqo_tpu.core import exceptions as core_exceptions


class TestApiUtils:
    def test_translate_api_device_good(self):
        """Reference test_translate_api_device_good (+ tpu extension)."""
        for given, expected in [("cpu", "cpu"), ("cuda", "cuda"),
                                ("CPU", "cpu"), ("CUDA2", "cuda:2"),
                                ("cuda1234", "cuda:1234"),
                                ("cpu1", "cpu:1"), ("tpu", "tpu"),
                                ("TPU3", "tpu:3"), (None, None)]:
            assert api_utils.translate_api_device(given) == expected

    def test_translate_api_device_bad(self):
        for bad in ["avr", "123"]:
            with pytest.raises(api_exceptions.InvalidArgError):
                api_utils.translate_api_device(bad)


class TestDecodeQueryStringModelAuth:
    def test_decode_none(self):
        assert api_utils.decode_query_string_model_auth() is None

    def test_decode_empty_string(self):
        assert api_utils.decode_query_string_model_auth("") is None

    def test_decode_valid(self):
        payload = json.dumps({"s3": {
            "aws_access_key_id": "some_acc_id",
            "aws_secret_access_key": "some_sece_key"}})
        encoded = urllib.parse.quote_plus(payload)
        result = api_utils.decode_query_string_model_auth(encoded)
        assert result.s3["aws_access_key_id"] == "some_acc_id"
        assert result.s3["aws_secret_access_key"] == "some_sece_key"
        assert result.hf is None

    def test_decode_invalid(self):
        with pytest.raises(pydantic.ValidationError):
            api_utils.decode_query_string_model_auth(
                "invalid_url_encoded_string")


@pytest.fixture
def app():
    from marqo_tpu.api.app import install_exception_mappers
    from marqo_tpu.api.http_framework import App
    application = App(title="test-app")
    install_exception_mappers(application)
    return application


def _get(app, path):
    resp = app.dispatch("GET", path, b"", {})
    return resp.status, resp.body


class TestExceptionTranslation:
    """Reference test_api_exception_handler.py matrix, via real dispatch
    (our equivalent of marqo_base_exception_handler is the app's ordered
    mapper table, api.py:88-141)."""

    MATRIX = [
        (base_exceptions.InternalError, 500, "internal"),
        (base_exceptions.InvalidArgumentError, 400, "invalid_argument"),
        (core_exceptions.IndexExistsError, 409, "index_already_exists"),
        (core_exceptions.IndexNotFoundError, 404, "index_not_found"),
        # ParsingError has no specific mapping -> generic unhandled 500
        (core_exceptions.ParsingError, 500, None),
        (core_exceptions.VespaDocumentParsingError, 500,
         "backend_data_parsing_error"),
        (core_exceptions.MarqoDocumentParsingError, 400,
         "invalid_argument"),
        (core_exceptions.InvalidDataTypeError, 400, "invalid_argument"),
        (core_exceptions.InvalidFieldNameError, 400,
         "invalid_field_name"),
        (core_exceptions.FilterStringParsingError, 400,
         "invalid_argument"),
        (core_exceptions.ZeroMagnitudeVectorError, 400, "bad_request"),
        (core_exceptions.ModelError, 400, "bad_request"),
        (core_exceptions.UnsupportedFeatureError, 400, "bad_request"),
        (core_exceptions.InternalError, 500, "internal"),
        (core_exceptions.TooManyFieldsError, 400, "bad_request"),
        (core_exceptions.OperationConflictError, 409,
         "operation_conflict"),
        (core_exceptions.BackendTimeoutError, 504,
         "vector_store_timeout"),
    ]

    def test_conversion_matrix(self, app):
        for exc_type, want_status, want_code in self.MATRIX:
            route = f"/raise-{exc_type.__name__}"

            def handler(request, _e=exc_type):
                raise _e("This is an error!")

            app.add_route("GET", route, handler)
            status, body = _get(app, route)
            assert status == want_status, (exc_type, status, body)
            if want_code is not None:
                assert body.get("code") == want_code, (exc_type, body)

    def test_unhandled_marqo_error_not_propagated(self, app):
        """Reference test_base_exception_handler_unhandled_error: the
        message of an unmapped MarqoError never reaches the client."""
        def handler(request):
            raise base_exceptions.MarqoError("This should not be propagated.")

        app.add_route("GET", "/raise-unhandled", handler)
        status, body = _get(app, "/raise-unhandled")
        assert status == 500
        assert "This should not be propagated." not in body["message"]
        assert "unexpected internal error" in body["message"]

    def test_vector_store_timeout_fixed_message(self, app):
        """Reference api.py:117-122 fixed message regardless of cause."""
        def handler(request):
            raise core_exceptions.BackendTimeoutError("engine shard 3 hung")

        app.add_route("GET", "/raise-timeout", handler)
        status, body = _get(app, "/raise-timeout")
        assert status == 504
        assert body["message"] == ("Vector store request timed out. Try "
                                   "your request again later.")
        assert body["type"] == "invalid_request"


class TestMarqoCustomRoute:
    """Reference test_custom_api_route.py: every handler exception is
    logged once with its stack trace BEFORE translation (route.py:19-23);
    normal routes don't log errors."""

    def _patch_logger(self, monkeypatch):
        import marqo_tpu.api.http_framework as fw
        calls = []
        real_error = fw.logger.error

        def spy(msg, *args, **kwargs):
            calls.append((msg, kwargs))

        monkeypatch.setattr(fw.logger, "error", spy)
        return calls

    def test_custom_route_logs_error(self, app, monkeypatch):
        calls = self._patch_logger(monkeypatch)

        def handler(request):
            raise ValueError("Test Error for MarqoCustomRoute")

        app.add_route("GET", "/test-route", handler)
        _get(app, "/test-route")
        assert len(calls) == 1
        assert "Test Error for MarqoCustomRoute" in str(calls[0][0])
        assert calls[0][1].get("exc_info") is True

    def test_custom_route_logs_api_exception(self, app, monkeypatch):
        calls = self._patch_logger(monkeypatch)

        def handler(request):
            raise api_exceptions.MarqoWebError(
                "Test API exceptions for MarqoCustomRoute")

        app.add_route("GET", "/raise-api-exception", handler)
        status, _ = _get(app, "/raise-api-exception")
        assert status == 500
        assert len(calls) == 1
        assert "Test API exceptions for MarqoCustomRoute" in str(calls[0][0])
        assert calls[0][1].get("exc_info") is True

    def test_custom_route_logs_base_exception(self, app, monkeypatch):
        calls = self._patch_logger(monkeypatch)

        def handler(request):
            raise base_exceptions.MarqoError(
                "Test Base exceptions for MarqoCustomRoute")

        app.add_route("GET", "/raise-base-exception", handler)
        status, _ = _get(app, "/raise-base-exception")
        assert status == 500
        assert len(calls) == 1
        assert "Test Base exceptions for MarqoCustomRoute" in str(calls[0][0])

    def test_normal_route_no_error_log(self, app, monkeypatch):
        calls = self._patch_logger(monkeypatch)

        def handler(request):
            from marqo_tpu.api.http_framework import Response
            return Response(200, {"message": "Hello, World!"})

        app.add_route("GET", "/normal-route", handler)
        status, body = _get(app, "/normal-route")
        assert status == 200
        assert body == {"message": "Hello, World!"}
        assert calls == []
