"""Docs-link registry sanity (reference tests/test_documentation.py checks
doc links)."""

import inspect

from marqo_tpu import marqo_docs
from marqo_tpu.version import __marqo_feature_level__, __version__, get_version


class TestDocsRegistry:
    def test_all_links_are_marqo_docs_urls(self):
        functions = [fn for name, fn in inspect.getmembers(
            marqo_docs, inspect.isfunction) if not name.startswith("_")]
        assert len(functions) >= 8
        for fn in functions:
            url = fn()
            assert url.startswith("https://docs.marqo.ai/"), (fn.__name__, url)
            assert " " not in url


class TestVersion:
    def test_version_shape(self):
        assert get_version() == __version__
        assert __version__.startswith(__marqo_feature_level__)
        assert __marqo_feature_level__ == "2.13.0"
