"""Offline checkpoint conversion CLI.

Converts a torch-layout checkpoint (torch pickle / safetensors / npz —
the formats the reference downloads, SURVEY §2.9) into a pre-converted
NATIVE params artifact (.npz of the wrapper's own flax param tree,
utils/checkpoints.py `save_params`). Wrappers detect and load the
artifact directly, so serving environments need neither torch nor the
layout converters at model-construction time, and skip the conversion
cost on every cold start.

Usage:
    python -m perceptor_tpu.convert INPUT --family stable-diffusion \
        [--name runwayml/stable-diffusion-v1-5] [--out models/sd.npz]

Families: stable-diffusion, guided-diffusion, velocity-diffusion,
monster-diffusion, latent-text2image, latent-face,
latent-super-resolution, open-clip (--name "ARCH/WEIGHTS").

The artifact lands in `models/` (the first checkpoint cache dir) by
default, under the same canonical basename the wrapper searches for —
so the very next construction picks it up automatically.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile


_FAMILIES = (
    "stable-diffusion",
    "guided-diffusion",
    "velocity-diffusion",
    "monster-diffusion",
    "latent-text2image",
    "latent-face",
    "latent-super-resolution",
    "open-clip",
    "simulacra-aesthetic",
)

_DEFAULT_NAMES = {
    "stable-diffusion": "runwayml/stable-diffusion-v1-5",
    "guided-diffusion": "standard",
    "velocity-diffusion": "yfcc_2",
    "monster-diffusion": "all",
    "latent-text2image": "txt2img-1p4B",
    "latent-face": "celebahq-ldm-vq-4",
    "latent-super-resolution": "sharpen-colab",
    "open-clip": "ViT-B-32/openai",
    "simulacra-aesthetic": "ViT-B-32",
}


def canonical_basename(family: str, name: str) -> str:
    """The basename the wrapper's find_checkpoint searches for."""
    if family == "stable-diffusion":
        return f"stable_diffusion_{name.replace('/', '_')}"
    if family == "guided-diffusion":
        return f"guided_diffusion_{name}"
    if family == "velocity-diffusion":
        return f"velocity_diffusion_{name}"
    if family == "monster-diffusion":
        return f"monster_diffusion_{name}"
    if family == "latent-text2image":
        return "latent_diffusion_text2image"
    if family == "latent-face":
        return "latent_diffusion_face"
    if family == "latent-super-resolution":
        return "latent_diffusion_super_resolution"
    if family == "open-clip":
        arch, _, weights = name.partition("/")
        return f"open_clip_{arch}_{weights}"
    if family == "simulacra-aesthetic":
        return f"simulacra_{name}"
    raise ValueError(f"unknown family {family!r}; choose from {_FAMILIES}")


def _fresh(cls, *args, **kwargs):
    """Construct bypassing the @utils.cache constructor memo: a memoized
    instance would carry params loaded BEFORE the staged checkpoint."""
    return getattr(cls, "__wrapped__", cls)(*args, **kwargs)


def _construct(family: str, name: str):
    """Construct the wrapper (fp32 so the artifact keeps full-precision
    masters; wrappers re-cast to bf16 storage on load when fp16=True)."""
    if family == "stable-diffusion":
        from perceptor_tpu.models.stable_diffusion import StableDiffusion

        return _fresh(StableDiffusion, name, fp16=False)
    if family == "guided-diffusion":
        from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

        return _fresh(GuidedDiffusion, name, fp16=False)
    if family == "velocity-diffusion":
        from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

        return _fresh(VelocityDiffusion, name, fp16=False)
    if family == "monster-diffusion":
        from perceptor_tpu.models.monster_diffusion import MonsterDiffusion

        return _fresh(MonsterDiffusion, name, fp16=False)
    if family == "latent-text2image":
        from perceptor_tpu.models.latent_diffusion import Text2Image

        return _fresh(Text2Image, fp16=False)
    if family == "latent-face":
        from perceptor_tpu.models.latent_diffusion import Face

        return _fresh(Face, fp16=False)
    if family == "latent-super-resolution":
        from perceptor_tpu.models.latent_diffusion import SuperResolution

        return _fresh(SuperResolution, fp16=False)
    if family == "open-clip":
        from perceptor_tpu.models.open_clip import OpenCLIP

        arch, _, weights = name.partition("/")
        return _fresh(OpenCLIP, arch, weights, precision="fp32")
    if family == "simulacra-aesthetic":
        from perceptor_tpu.models.simulacra_aesthetic import SimulacraAesthetic

        return _fresh(SimulacraAesthetic, name)
    raise ValueError(f"unknown family {family!r}; choose from {_FAMILIES}")


def convert(input_path: str, family: str, name: str, out: str) -> str:
    """Convert `input_path` and write the native artifact to `out`."""
    if not os.path.exists(input_path):
        raise FileNotFoundError(input_path)
    suffix = os.path.splitext(input_path)[1] or ".pt"
    # stage the input under the canonical basename in a private cache dir
    # so the wrapper's own (find_checkpoint -> convert) path does the work
    staging = tempfile.mkdtemp(prefix="perceptor_tpu_convert_")
    try:
        staged = os.path.join(
            staging, canonical_basename(family, name) + suffix
        )
        os.symlink(os.path.abspath(input_path), staged)
        from perceptor_tpu.utils import checkpoints

        original_dirs = checkpoints.CACHE_DIRS
        checkpoints.CACHE_DIRS = (staging,)
        try:
            wrapper = _construct(family, name)
        finally:
            checkpoints.CACHE_DIRS = original_dirs
        checkpoints.save_params(out, wrapper.params)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return out if out.endswith(".npz") else out + ".npz"


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m perceptor_tpu.convert", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("input", help="torch-layout checkpoint to convert")
    parser.add_argument("--family", required=True, choices=_FAMILIES)
    parser.add_argument(
        "--name", default=None,
        help="checkpoint/config name within the family "
        "(default: the family's flagship)",
    )
    parser.add_argument(
        "--out", default=None,
        help="output artifact path (default: models/<canonical>.npz)",
    )
    args = parser.parse_args(argv)
    name = args.name or _DEFAULT_NAMES[args.family]
    out = args.out or os.path.join(
        "models", canonical_basename(args.family, name) + ".npz"
    )
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    written = convert(args.input, args.family, name, out)
    print(f"wrote {written}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
