"""Port of the reference's route-level API suite.

Source: /root/reference/tests/tensor_search/test_api.py (all four classes).
Fixture payloads and asserted message fragments are identical; the harness
is the repo's in-process Client over App.dispatch (the reference uses
fastapi TestClient). The VESPA_SEARCH_TIMEOUT_MS test is adapted: there is
no external Vespa process here, so the 504 envelope mapping is exercised by
raising the engine-timeout error from the search handler directly — same
status/code/type assertions.
"""

import uuid
from unittest import mock

import pytest

from marqo_tpu.api.app import build_app, on_start
from marqo_tpu.config import Config
from marqo_tpu.inference import vectorise as inference

from tests.test_api import Client


@pytest.fixture
def client(monkeypatch):
    monkeypatch.setenv("MARQO_MODELS_TO_PRELOAD", "[]")
    inference.clear_loaded_models()
    config = Config()
    on_start(config)
    app = build_app(config)
    c = Client(app)
    yield c
    config.index_meta_cache.stop_refresh_thread()
    inference.clear_loaded_models()


@pytest.fixture
def structured_client(client):
    status, body = client.post("/indexes/api-structured", {
        "type": "structured",
        "model": "test",
        "allFields": [
            {"name": "field1", "type": "text",
             "features": ["lexical_search"]},
            {"name": "field2", "type": "text"},
        ],
        "tensorFields": ["field1"],
    })
    assert status == 200, body
    return client


class TestMemoryEndpoint:
    """reference test_api.py:53-75"""

    def test_memory(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_DEBUG_API", "TRUE")
        status, data = client.get("/memory")
        assert status == 200
        assert set(data.keys()) == {"memory_used", "stats"}

    def test_memory_defaultDisabled(self, client, monkeypatch):
        monkeypatch.delenv("MARQO_ENABLE_DEBUG_API", raising=False)
        status, _ = client.get("/memory")
        assert status == 403

    def test_memory_disabled_403(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_DEBUG_API", "FALSE")
        status, _ = client.get("/memory")
        assert status == 403


class TestCustomSearchLimits:
    """reference test_api.py:77-123"""

    def test_custom_search_limit(self, client, monkeypatch):
        client.post("/indexes/api-limits", {"model": "random"})
        for custom_limit in [2000, 1000000]:
            monkeypatch.setenv("MARQO_MAX_SEARCH_LIMIT", str(custom_limit))
            monkeypatch.setenv("MARQO_MAX_RETRIEVABLE_DOCS",
                               str(custom_limit + 1000000))
            status, body = client.post("/indexes/api-limits/search", {
                "q": "test", "searchMethod": "TENSOR",
                "limit": custom_limit + 1,
            })
            assert status == 400
            assert (f"result limit must be less than or equal to the "
                    f"MARQO_MAX_SEARCH_LIMIT limit of [{custom_limit}]"
                    ) in body["message"]

    def test_custom_search_offset(self, client, monkeypatch):
        client.post("/indexes/api-limits", {"model": "random"})
        for custom_offset in [2000, 1000000]:
            monkeypatch.setenv("MARQO_MAX_SEARCH_OFFSET", str(custom_offset))
            monkeypatch.setenv("MARQO_MAX_RETRIEVABLE_DOCS",
                               str(custom_offset + 1000000))
            status, body = client.post("/indexes/api-limits/search", {
                "q": "test", "searchMethod": "TENSOR",
                "offset": custom_offset + 1,
            })
            assert status == 400
            assert (f"The search result offset must be less than or equal "
                    f"to the MARQO_MAX_SEARCH_OFFSET limit of "
                    f"[{custom_offset}]") in body["message"]


class TestValidationApi:
    """reference test_api.py:125-208"""

    GOOD_SETTINGS = {
        "treatUrlsAndPointersAsImages": False,
        "model": "hf/e5-large",
        "normalizeEmbeddings": True,
        "textPreprocessing": {
            "splitLength": 2,
            "splitOverlap": 0,
            "splitMethod": "sentence",
        },
        "imagePreprocessing": {"patchMethod": None},
        "annParameters": {
            "spaceType": "euclidean",
            "parameters": {"efConstruction": 128, "m": 16},
        },
        "type": "unstructured",
    }

    def test_schema_validation_defaultDisabled(self, client, monkeypatch):
        monkeypatch.delenv("MARQO_ENABLE_OPS_API", raising=False)
        status, _ = client.post("/validate/index/test-index", {
            "type": "structured", "allFields": [], "tensorFields": []})
        assert status == 403

    def test_ops_api_disabled_403(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_OPS_API", "FALSE")
        status, _ = client.post("/validate/index/test-index", {
            "type": "structured", "allFields": [], "tensorFields": []})
        assert status == 403

    def test_ops_api_200(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_OPS_API", "TRUE")
        status, body = client.post("/validate/index/test-index",
                                   self.GOOD_SETTINGS)
        assert status == 200, body
        assert body == {"validated": True, "index": "test-index"}

    def test_ops_api_400(self, client, monkeypatch):
        monkeypatch.setenv("MARQO_ENABLE_OPS_API", "TRUE")
        bad = dict(self.GOOD_SETTINGS, type="unknown")
        status, body = client.post("/validate/index/test-index", bad)
        assert status in (400, 422)
        assert "message" in body
        assert body["type"] == "invalid_request"


class TestApiErrors:
    """reference test_api.py:262-563"""

    def test_index_not_found_error(self, client):
        index_name = "a" + str(uuid.uuid4()).replace("-", "")
        status, body = client.delete("/indexes/" + index_name)
        assert status == 404
        assert body["code"] == "index_not_found"
        assert body["type"] == "invalid_request"
        assert "not found" in body["message"] and \
            index_name in body["message"]

    def test_index_already_exists(self, structured_client):
        status, body = structured_client.post("/indexes/api-structured", {
            "type": "structured", "allFields": [], "tensorFields": []})
        assert status == 409
        assert body["code"] == "index_already_exists"
        assert body["type"] == "invalid_request"
        assert "already exists" in body["message"] and \
            "api-structured" in body["message"]

    def test_invalid_field_name(self, structured_client):
        status, body = structured_client.post(
            "/indexes/api-structured/search", {
                "q": "test",
                "attributesToRetrieve": ["non_existent_field"]})
        assert status == 400
        assert body["code"] == "invalid_field_name"
        assert body["type"] == "invalid_request"
        assert "has no field non_existent_field" in body["message"]

    def test_invalid_data_type(self, structured_client):
        # wrong declared type only rejects THAT document, not the request
        status, body = structured_client.post(
            "/indexes/api-structured/documents",
            {"documents": [{"field2": 123}]})
        assert status == 200
        assert body["errors"] is True
        assert "Expected a value of type" in body["items"][0]["error"]

    def test_filter_string_parsing_error(self, structured_client):
        status, body = structured_client.post(
            "/indexes/api-structured/search", {"q": "test", "filter": ""})
        assert status == 400
        assert body["code"] == "invalid_argument"
        assert body["type"] == "invalid_request"
        assert "Cannot parse empty filter string" in body["message"]

    def test_engine_timeout_error(self, structured_client):
        # adapted from the reference's VespaTimeoutError patch: the engine
        # timeout surfaces as 504 vector_store_timeout
        from marqo_tpu.core import exceptions as core_exceptions
        error = core_exceptions.BackendTimeoutError("timeout_msg")
        with mock.patch(
                "marqo_tpu.tensor_search.tensor_search.search",
                side_effect=error):
            status, body = structured_client.post(
                "/indexes/api-structured/search", {"q": "test"})
        assert status == 504
        assert body["code"] == "vector_store_timeout"
        assert body["type"] == "invalid_request"

    def test_invalid_argument_error(self, client):
        status, body = client.post(
            "/indexes/a" + str(uuid.uuid4()).replace("-", ""), {
                "type": "structured",
                "allFields": [{"name": "field1", "type": "text"}],
                "tensorFields": [],
                "model": "random_nonexistent_model",
            })
        assert status == 400
        assert body["code"] == "invalid_argument"
        assert body["type"] == "invalid_request"
        assert "Could not find model properties for" in body["message"]

    def test_create_index_snake_case_fails(self, client):
        test_cases_fail = [
            ({
                 "type": "structured",
                 "allFields": [
                     {"name": "field1", "type": "text"},
                     {"name": "field2", "type": "text"},
                     {"name": "field3", "type": "multimodal_combination",
                      "dependent_fields": {"field1": 0.5, "field2": 0.5}},
                 ],
                 "tensorFields": [],
             }, "dependent_fields"),
            ({
                 "type": "structured",
                 "allFields": [],
                 "tensorFields": [],
                 "annParameters": {
                     "spaceType": "dotproduct",
                     "parameters": {"ef_construction": 128, "m": 16},
                 },
             }, "ef_construction"),
            ({
                 "type": "unstructured",
                 "annParameters": {
                     "spaceType": "dotproduct",
                     "parameters": {"ef_construction": 128, "m": 16},
                 },
             }, "ef_construction"),
        ]
        for test_case, field in test_cases_fail:
            status, body = client.post("/indexes/my-index", test_case)
            assert status == 422, (field, body)
            assert f"Invalid field name '{field}'" in str(body)

        # snake_case in user data (field names, dependentFields keys,
        # modelProperties keys) is valid
        index_name = "a" + str(uuid.uuid4()).replace("-", "")
        status, body = client.post(f"/indexes/{index_name}", {
            "type": "structured",
            "allFields": [
                {"name": "field_1", "type": "text"},
                {"name": "field_2", "type": "text"},
                {"name": "field_3", "type": "multimodal_combination",
                 "dependentFields": {"field_1": 0.5, "field_2": 0.5}},
            ],
            "tensorFields": ["field_3"],
            "model": "test",
        })
        assert status == 200, body

    def test_invalid_structured_index_field_type(self, client):
        for bad_type in ["bulabua", [], None, ""]:
            index_name = "a" + str(uuid.uuid4()).replace("-", "")
            status, body = client.post(f"/indexes/{index_name}", {
                "type": "structured",
                "allFields": [{"name": "field1", "type": bad_type}],
                "tensorFields": []})
            assert status == 422, (bad_type, body)
            text = str(body)
            assert "allFields" in text
            assert "type" in text

    def test_invalid_structured_index_field_features(self, client):
        for bad_features in ["bulabua", None, ""]:
            index_name = "a" + str(uuid.uuid4()).replace("-", "")
            status, body = client.post(f"/indexes/{index_name}", {
                "type": "structured",
                "allFields": [{"name": "field1", "type": "text",
                               "features": bad_features}],
                "tensorFields": []})
            assert status == 422, (bad_features, body)
            text = str(body)
            assert "allFields" in text
            assert "features" in text

    def test_log_stack_trace_for_core_exceptions(self, structured_client):
        # every handler exception is logged with exc_info before
        # translation (reference api/route.py:19-23)
        from marqo_tpu.core import exceptions as core_exceptions
        raised = core_exceptions.IndexExistsError("index1")
        with mock.patch(
                "marqo_tpu.api.http_framework.logger.error") as mock_err:
            with mock.patch(
                    "marqo_tpu.core.index_management.index_management"
                    ".IndexManagement.create_index", side_effect=raised):
                structured_client.post("/indexes/api-structured", {
                    "type": "structured",
                    "allFields": [{"name": "field1", "type": "text"}],
                    "tensorFields": []})
            mock_err.assert_called_once()
            assert "index1" in str(mock_err.call_args)

    def test_log_stack_trace_for_base_exceptions_invalid_arg(
            self, structured_client):
        from marqo_tpu.core.exceptions import InvalidArgumentError
        raised = InvalidArgumentError("invalid_arg_msg")
        with mock.patch(
                "marqo_tpu.api.http_framework.logger.error") as mock_err:
            with mock.patch(
                    "marqo_tpu.tensor_search.tensor_search.search",
                    side_effect=raised):
                structured_client.post("/indexes/api-structured/search",
                                       {"q": "test"})
            mock_err.assert_called_once()
            assert "invalid_arg_msg" in str(mock_err.call_args)

    def test_log_stack_trace_for_base_exceptions_internal(
            self, structured_client):
        from marqo_tpu.exceptions import InternalError
        raised = InternalError("internal_error_msg")
        with mock.patch(
                "marqo_tpu.api.http_framework.logger.error") as mock_err:
            with mock.patch(
                    "marqo_tpu.tensor_search.tensor_search"
                    ".get_document_by_id", side_effect=raised):
                structured_client.get("/indexes/api-structured/documents/1")
            mock_err.assert_called_once()
            assert "internal_error_msg" in str(mock_err.call_args)
