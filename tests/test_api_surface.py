"""Public API surface parity with the reference package.

Every symbol the reference re-exports from its layer __init__s
(reference perceptor/drawers/__init__.py:1-6, losses/__init__.py:1-18,
models/__init__.py:1-20, transforms/__init__.py:1-4, utils/__init__.py:1-3)
must exist at the same place in perceptor_tpu, so a reference user can
switch imports 1:1 (see docs/MIGRATION.md).
"""

import jax
import pytest

import perceptor_tpu as pt

REFERENCE_EXPORTS = {
    "drawers": [
        "BruteDiffusion",
        "BruteRuDalle",
        "DeepImagePrior",
        "JPEG",
        "Raw",
        "StyleGANXL",
    ],
    "losses": [
        "AestheticVisualAssessment",
        "BLIP",
        "CLIP",
        "CLOOB",
        "LPIPS",
        "LiT",
        "Memorability",
        "OWLViT",
        "OpenCLIP",
        "Resize",
        "RuCLIP",
        "SLIP",
        "SimulacraAesthetic",
        "Smoothness",
        "SphericalDistance",
        "StyleTransfer",
        "SuperResolution",
        "SuperResolutionDiscriminator",
        "TransformersOpenAICLIP",
        "VelocityDiffusion",
    ],
    "models": [
        "AdaBinsDepth",
        "BLIP",
        "CLIP",
        "CLOOB",
        "DeepImagePrior",
        "GlideCLIP",
        "GuidedDiffusion",
        "MidasDepth",
        "MonsterDiffusion",
        "OWLViT",
        "OpenCLIP",
        "RuCLIP",
        "SLIP",
        "SimulacraAesthetic",
        "StableDiffusion",
        "StyleGANXL",
        "SuperResolution",
        "TransformersOpenAICLIP",
        "VelocityDiffusion",
        "latent_diffusion",
    ],
    "transforms": [
        "ClampWithGrad",
        "DynamicThreshold",
        "SuperResolution",
        "clamp_with_grad",
        "dynamic_threshold",
        "resize",
    ],
    "utils": ["cache", "pil_image"],
}


@pytest.mark.parametrize("layer", sorted(REFERENCE_EXPORTS))
def test_layer_exports_match_reference(layer):
    mod = getattr(pt, layer)
    missing = [s for s in REFERENCE_EXPORTS[layer] if not hasattr(mod, s)]
    assert not missing, f"perceptor_tpu.{layer} missing: {missing}"


def test_tpu_first_additions_present():
    for name in ("ops", "parallel", "engine", "schedules", "predictions", "core"):
        assert hasattr(pt, name), name
    assert callable(pt.parallel.ring_attention)
    assert callable(pt.parallel.ulysses_attention)
    assert callable(pt.parallel.pipeline)
    assert callable(pt.engine.guided_sample)
