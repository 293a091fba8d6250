"""Every registry entry must resolve through the loader dispatch: a model
class, or an honest ModelLoadError gate (EVA02 / NLLB-SigLIP) — never an
unknown-type error or a crash. Catches registry/dispatch drift (e.g. a
new family added to the registry without a routing branch)."""

import pytest

from marqo_tpu.core.exceptions import ModelLoadError
from marqo_tpu.inference.loaders import resolve_model_class
from marqo_tpu.inference.model_registry import load_model_properties

GATED_TOKENS = ("eva02", "nllb")


def test_every_registry_entry_resolves():
    registry = load_model_properties()
    assert len(registry) >= 289
    gated, resolved = [], 0
    for name, props in registry.items():
        try:
            cls = resolve_model_class(name, props)
            assert cls is not None, name
            resolved += 1
        except ModelLoadError:
            assert any(t in name.lower() for t in GATED_TOKENS), (
                f"{name} gated but not a known-gated family")
            gated.append(name)
    # the known gates are exactly the EVA02 + NLLB entries
    assert 3 <= len(gated) <= 8, gated
    assert resolved + len(gated) == len(registry)


def test_gated_families_raise_clear_errors():
    registry = load_model_properties()
    for name, props in registry.items():
        if any(t in name.lower() for t in GATED_TOKENS):
            with pytest.raises(ModelLoadError,
                               match="not yet supported"):
                resolve_model_class(name, props)
