"""Every registry entry must resolve through the loader dispatch to a
model class — never an unknown-type error or a crash. Catches
registry/dispatch drift (e.g. a new family added to the registry without
a routing branch). As of round 3 there are NO gated families left:
EVA02 and NLLB-SigLIP resolve to native towers (their real-checkpoint
loading is what is gated, behind MARQO_ALLOW_UNVERIFIED_CONVERSION)."""

from marqo_tpu.inference.loaders import resolve_model_class
from marqo_tpu.inference.model_registry import load_model_properties


def test_every_registry_entry_resolves():
    registry = load_model_properties()
    assert len(registry) >= 289
    for name, props in registry.items():
        cls = resolve_model_class(name, props)
        assert cls is not None, name


def test_eva02_and_nllb_resolve_to_native_towers():
    from marqo_tpu.models.eva02 import JaxEVA02Model
    from marqo_tpu.models.nllb_siglip import JaxNLLBSigLIPModel
    registry = load_model_properties()
    eva = [n for n in registry if "eva02" in n.lower()]
    nllb = [n for n in registry if "nllb" in n.lower()]
    assert len(eva) >= 3 and len(nllb) >= 4
    for name in eva:
        assert resolve_model_class(name, registry[name]) is JaxEVA02Model
    for name in nllb:
        assert resolve_model_class(name,
                                   registry[name]) is JaxNLLBSigLIPModel
