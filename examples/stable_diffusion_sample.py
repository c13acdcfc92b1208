"""Text-to-image with Stable Diffusion — the reference's sample() workflow.

Reference equivalent (perceptor/models/stable_diffusion/stable_diffusion.py:384-491):
a host-side generator stepping the scheduler with two UNet calls per step.
Here the full 50-step CFG sampler is ONE lax.scan program; pass
`cache_interval=3` for DeepCache block caching (~1.4x faster, small
bounded quality cost).

Weights: place converted SD checkpoints in the local cache
(see perceptor_tpu/utils/checkpoints.py); without them the model runs
with deterministic random weights (pipeline-correct, image is noise).

Run: python examples/stable_diffusion_sample.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax

from perceptor_tpu import utils
from perceptor_tpu.models.stable_diffusion import StableDiffusion


def main():
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer

    try:
        tokenizer = SimpleTokenizer()
        tokenizer_ok = True
    except FileNotFoundError:
        # no BPE vocab on disk (offline environment): degenerate tokenizer
        tokenizer = SimpleTokenizer(merges=[])
        tokenizer_ok = False
    model = StableDiffusion(
        "runwayml/stable-diffusion-v1-5", tokenizer=tokenizer
    )

    images = model.sample(
        texts=["a photograph of an astronaut riding a horse"],
        n_steps=50,
        guidance_scale=7.0,
        size=(512, 512),
        key=jax.random.PRNGKey(0),
        cache_interval=1,  # 1 = exact; 3 = DeepCache (faster)
    )
    utils.pil_image(images.clip(0.0, 1.0)).save("stable_diffusion_sample.png")
    print(
        "wrote stable_diffusion_sample.png"
        + ("" if tokenizer_ok else " (degenerate tokenizer: offline mode)")
    )


if __name__ == "__main__":
    main()
