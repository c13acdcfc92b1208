"""Certify-registry smoke test (VERDICT r4 #4).

Round 4's `certify.py --families all` sweep found a kwarg typo in the
open-clip registry entry at run time — proving registry entries were
never validated in CI: a wrong module path, class name, or constructor
kwarg would only fail on weight-arrival day. This test constructs the
registry's *metadata* cheaply (import the module, resolve the class,
bind the kwargs against the real constructor signature, check the
parity-test file exists and the drive kind is known) without building
any model, so a bad entry fails the default tier, not the sweep.
"""

import importlib
import inspect
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import certify  # noqa: E402  (scripts/certify.py)

KNOWN_KINDS = {
    "clip", "images-only", "glide", "owlvit", "map", "features", "pair",
    "enhance",
}


@pytest.mark.parametrize("key", sorted(certify.PERCEPTION))
def test_perception_entry_resolves(key):
    module_path, cls_name, kwargs, quick_kwargs, weight_names, test_path, kind = (
        certify.PERCEPTION[key]
    )
    module = importlib.import_module(module_path)
    cls = getattr(module, cls_name)  # wrong class name -> AttributeError
    target = getattr(cls, "__wrapped__", cls)

    # the round-4 failure mode: a kwarg the constructor does not accept.
    # bind() (not bind_partial) also catches *missing* required args.
    sig = inspect.signature(target)
    for kw in (kwargs, quick_kwargs):
        if kw is None:
            continue
        try:
            sig.bind(**kw)
        except TypeError as e:
            pytest.fail(
                f"{key}: kwargs {kw} do not bind to {cls_name}{sig}: {e}"
            )

    assert kind in KNOWN_KINDS, f"{key}: unknown drive kind {kind!r}"
    assert weight_names and all(isinstance(w, str) for w in weight_names)
    assert os.path.exists(os.path.join(REPO, test_path)), (
        f"{key}: parity test file {test_path} does not exist"
    )


def test_all_families_have_certifiers():
    """Every generator family + drawers + every perception key is
    constructible from the CLI's --families all list."""
    for family, fn in certify.CERTIFIERS.items():
        assert callable(fn), family
    for family in certify.DEFAULT_FAMILIES:
        assert family in certify.CERTIFIERS
    # CLI spelling of every key is non-empty and comma-safe
    for family in certify.CERTIFIERS:
        assert family and "," not in family and " " not in family


def test_registry_smoke_would_have_caught_round4_typo():
    """Teeth: a deliberately wrong kwarg fails the same check the real
    entries pass (the guard is not vacuous)."""
    module = importlib.import_module("perceptor_tpu.models.open_clip")
    cls = getattr(module, "OpenCLIP")
    target = getattr(cls, "__wrapped__", cls)
    sig = inspect.signature(target)
    with pytest.raises(TypeError):
        sig.bind(architecture="ViT-B-32", weights_name="openai")  # bad kwarg
