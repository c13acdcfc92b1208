"""Differentiable image parameterizations
(reference perceptor/drawers/__init__.py:1-6)."""

from perceptor_tpu.drawers.interface import DrawingInterface
from perceptor_tpu.drawers.raw import Raw

_LAZY = {
    "BruteDiffusion": ("perceptor_tpu.drawers.brute_diffusion", "BruteDiffusion"),
    "DeepImagePrior": ("perceptor_tpu.drawers.deep_image_prior", "DeepImagePrior"),
    "JPEG": ("perceptor_tpu.drawers.jpeg", "JPEG"),
    "BruteRuDalle": ("perceptor_tpu.drawers.rudalle", "BruteRuDalle"),
    "StyleGANXL": ("perceptor_tpu.drawers.stylegan_xl", "StyleGANXL"),
}

__all__ = ["DrawingInterface", "Raw"] + list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module_name, attr = _LAZY[name]
        value = getattr(importlib.import_module(module_name), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'perceptor_tpu.drawers' has no attribute {name!r}")
