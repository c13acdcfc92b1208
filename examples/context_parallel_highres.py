"""Context-parallel 1024px Stable Diffusion across a TPU slice.

At 1024px the level-0 self-attention runs over 16,384 latent tokens —
past what one chip's HBM enjoys, and exactly the shape SURVEY §2.8's
context parallelism targets. A mesh with a `context` axis shards the
token/spatial axis across chips: `sample(mesh=...)` activates the
routing plan (parallel/plan.py) that runs self-attention as a ppermute
ring, cross-attention as Ulysses all_to_all, and the conv body spatially
(GSPMD halo exchanges). Per-chip attention memory falls 1/n²; no (S, S)
matrix exists anywhere in the slice.

On a single-chip checkout this example still runs (context=1 degrades to
the plain path); on an 8-chip v5e slice set context=8. The same pattern
applies to `engine.guided_sample(mesh=...)` for loss-guided generation.

Run: python examples/context_parallel_highres.py [--size 1024] [--context N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax

from perceptor_tpu import parallel, utils
from perceptor_tpu.models.stable_diffusion import StableDiffusion


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument(
        "--context", type=int, default=0,
        help="context-axis size (0 = all devices)",
    )
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    n = args.context or len(jax.devices())
    mesh = parallel.create_mesh(
        data=1, context=n, devices=jax.devices()[:n]
    )
    print(f"mesh: {dict(mesh.shape)} on {mesh.devices.size} devices")

    model = StableDiffusion("runwayml/stable-diffusion-v1-5")
    images = model.sample(
        ["a panoramic watercolor of a mountain harbor at dawn"],
        n_steps=args.steps,
        size=(args.size, args.size),
        mesh=mesh,
        key=jax.random.PRNGKey(0),
    )
    utils.pil_image(images.clip(0.0, 1.0)).save("context_parallel_highres.png")
    print(f"wrote context_parallel_highres.png ({args.size}px, "
          f"context={n}: ring self-attention + Ulysses cross-attention + "
          f"spatially sharded convs)")


if __name__ == "__main__":
    main()
