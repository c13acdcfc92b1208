"""CLIP = OpenCLIP with OpenAI weights (reference perceptor/models/clip.py:6-27).

OpenAI checkpoints use QuickGELU; the reference fixes up names that lack the
-quickgelu suffix the same way.
"""

from __future__ import annotations

from perceptor_tpu.models.open_clip import OpenCLIP

_QUICKGELU_FIXUP = {
    "RN50": "RN50-quickgelu",
    "RN101": "RN101-quickgelu",
    "ViT-B-32": "ViT-B-32-quickgelu",
    "ViT-B-16": "ViT-B-16-quickgelu",
    "ViT-L-14": "ViT-L-14-quickgelu",
    "ViT-L-14-336": "ViT-L-14-336-quickgelu",
}


def CLIP(name: str = "ViT-B-32", precision=None, jit=False, **kwargs):
    """
    Args:
        name: CLIP model name (ViT-B-32, ViT-B-16, ViT-L-14, ViT-L-14-336, ...)
    """
    del jit  # the whole framework is jit-compiled; kept for API parity
    architecture = _QUICKGELU_FIXUP.get(name, name)
    return OpenCLIP(architecture, "openai", precision=precision, **kwargs)
