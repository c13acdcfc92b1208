"""Frozen pretrained model wrappers (reference perceptor/models/__init__.py:1-20).

All wrappers are lazy imports so `import perceptor_tpu.models` stays cheap.
"""

_EXPORTS = {
    "OpenCLIP": ("perceptor_tpu.models.open_clip", "OpenCLIP"),
    "CLIP": ("perceptor_tpu.models.clip_alias", "CLIP"),
    "VelocityDiffusion": (
        "perceptor_tpu.models.velocity_diffusion",
        "VelocityDiffusion",
    ),
    "StableDiffusion": (
        "perceptor_tpu.models.stable_diffusion",
        "StableDiffusion",
    ),
    "GuidedDiffusion": (
        "perceptor_tpu.models.guided_diffusion",
        "GuidedDiffusion",
    ),
    "MonsterDiffusion": (
        "perceptor_tpu.models.monster_diffusion",
        "MonsterDiffusion",
    ),
    "DeepImagePrior": (
        "perceptor_tpu.models.deep_image_prior",
        "DeepImagePrior",
    ),
    "VGG19": ("perceptor_tpu.models.vgg", "VGG19"),
    "SuperResolution": (
        "perceptor_tpu.models.super_resolution",
        "SuperResolution",
    ),
    "MidasDepth": ("perceptor_tpu.models.midas_depth", "MidasDepth"),
    "AdaBinsDepth": ("perceptor_tpu.models.adabins_depth", "AdaBinsDepth"),
    "SimulacraAesthetic": (
        "perceptor_tpu.models.simulacra_aesthetic",
        "SimulacraAesthetic",
    ),
    "AestheticVisualAssessment": (
        "perceptor_tpu.models.aesthetic_visual_assessment",
        "AestheticVisualAssessment",
    ),
    "BLIP": ("perceptor_tpu.models.blip", "BLIP"),
    "CLOOB": ("perceptor_tpu.models.cloob", "CLOOB"),
    "SLIP": ("perceptor_tpu.models.slip", "SLIP"),
    "LiT": ("perceptor_tpu.models.lit", "LiT"),
    "ResMem": ("perceptor_tpu.models.resmem", "ResMem"),
    "RuCLIP": ("perceptor_tpu.models.ruclip", "RuCLIP"),
    "GlideCLIP": ("perceptor_tpu.models.glide_clip", "GlideCLIP"),
    "OWLViT": ("perceptor_tpu.models.owlvit", "OWLViT"),
    "StyleGANXL": ("perceptor_tpu.models.stylegan_xl", "StyleGANXL"),
    "TransformersOpenAICLIP": (
        "perceptor_tpu.models.transformers_openai_clip",
        "TransformersOpenAICLIP",
    ),
    "latent_diffusion": ("perceptor_tpu.models.latent_diffusion", None),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module_name, attr = _EXPORTS[name]
        module = importlib.import_module(module_name)
        value = module if attr is None else getattr(module, attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'perceptor_tpu.models' has no attribute {name!r}")
