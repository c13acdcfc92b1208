"""perceptor_tpu — a TPU-native guided image-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
samedii/perceptor (see /root/reference): differentiable image
parameterizations ("drawers"), frozen pretrained model wrappers with a
diffusion Predictions algebra ("models"), differentiable guidance
objectives ("losses"), and differentiable image transforms
("transforms") — all composable into jit-compiled, mesh-shardable
gradient-guided generation loops.

Layer map (mirrors reference perceptor/__init__.py:1):
    drawers    — trainable image parameterizations (functional pytrees)
    losses     — guidance objectives over images
    models     — frozen pretrained networks + diffusion math
    transforms — differentiable image ops (resize, clamp, threshold)
    utils      — cross-cutting helpers
TPU-first additions not present in the reference:
    ops        — Pallas/XLA kernels (attention, groupnorm, upfirdn, resize)
    parallel   — device mesh, sharding rules, collectives
    engine     — fused jitted guidance/sampling steps
    schedules  — pure-function diffusion schedule math
"""

__version__ = "0.1.0"

from perceptor_tpu import core
from perceptor_tpu import ops
from perceptor_tpu import schedules
from perceptor_tpu import transforms
from perceptor_tpu import utils

__all__ = [
    "core",
    "ops",
    "schedules",
    "transforms",
    "utils",
    "drawers",
    "losses",
    "models",
    "parallel",
    "engine",
]


def __getattr__(name):
    # Lazy imports for the heavier layers so `import perceptor_tpu` stays fast.
    if name in ("drawers", "losses", "models", "parallel", "engine", "predictions"):
        import importlib

        module = importlib.import_module(f"perceptor_tpu.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'perceptor_tpu' has no attribute {name!r}")
