"""Guidance objectives (reference perceptor/losses/__init__.py:1-18)."""

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.losses.smoothness import Smoothness
from perceptor_tpu.losses.resize import Resize
from perceptor_tpu.losses.spherical_distance import SphericalDistance

_LAZY = {
    "CLIP": ("perceptor_tpu.losses.clip", "CLIP"),
    "OpenCLIP": ("perceptor_tpu.losses.open_clip", "OpenCLIP"),
    "BLIP": ("perceptor_tpu.losses.blip", "BLIP"),
    "CLOOB": ("perceptor_tpu.losses.cloob", "CLOOB"),
    "SLIP": ("perceptor_tpu.losses.slip", "SLIP"),
    "RuCLIP": ("perceptor_tpu.losses.ruclip", "RuCLIP"),
    "LiT": ("perceptor_tpu.losses.lit", "LiT"),
    "OWLViT": ("perceptor_tpu.losses.owlvit", "OWLViT"),
    "StyleTransfer": ("perceptor_tpu.losses.style_transfer", "StyleTransfer"),
    "LPIPS": ("perceptor_tpu.losses.lpips", "LPIPS"),
    "Memorability": ("perceptor_tpu.losses.memorability", "Memorability"),
    "MidasDepth": ("perceptor_tpu.losses.midas_depth", "MidasDepth"),
    "SimulacraAesthetic": (
        "perceptor_tpu.losses.simulacra_aesthetic",
        "SimulacraAesthetic",
    ),
    "AestheticVisualAssessment": (
        "perceptor_tpu.losses.aesthetic_visual_assessment",
        "AestheticVisualAssessment",
    ),
    "SuperResolution": ("perceptor_tpu.losses.super_resolution", "SuperResolution"),
    "SuperResolutionDiscriminator": (
        "perceptor_tpu.losses.super_resolution",
        "SuperResolutionDiscriminator",
    ),
    "VelocityDiffusion": (
        "perceptor_tpu.losses.velocity_diffusion",
        "VelocityDiffusion",
    ),
    "TransformersOpenAICLIP": (
        "perceptor_tpu.losses.transformers_openai_clip",
        "TransformersOpenAICLIP",
    ),
}

__all__ = [
    "LossInterface",
    "Smoothness",
    "Resize",
    "SphericalDistance",
] + list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module_name, attr = _LAZY[name]
        value = getattr(importlib.import_module(module_name), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'perceptor_tpu.losses' has no attribute {name!r}")
