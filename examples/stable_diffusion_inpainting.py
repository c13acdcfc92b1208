"""Inpainting with the Stable Diffusion inpainting checkpoint.

Reference equivalent (perceptor/models/stable_diffusion/stable_diffusion.py:325-375
+ :477-484): the 9-channel inpainting UNet input (diffused latents,
downsampled blurred mask, masked-image latents) and the per-step
re-injection of the known region (`replace_diffused`). Here the whole
masked 50-step CFG sampler is ONE lax.scan program.

Weights: place the converted runwayml/stable-diffusion-inpainting
checkpoint in the local cache (see perceptor_tpu/utils/checkpoints.py);
without it the model runs with deterministic random weights
(pipeline-correct, output is noise).

Run: python examples/stable_diffusion_inpainting.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.models.stable_diffusion import StableDiffusion
from perceptor_tpu.models.stable_diffusion.stable_diffusion import INPAINTING_NAME


def main():
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer

    try:
        tokenizer = SimpleTokenizer()
    except FileNotFoundError:  # offline fallback: degenerate tokenizer
        tokenizer = SimpleTokenizer(merges=[])
    model = StableDiffusion(INPAINTING_NAME, tokenizer=tokenizer)

    # an "image to repair": smooth gradient, with the center square masked out
    h = w = 512
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    init_images = jnp.stack(
        [jnp.asarray(yy / h), jnp.asarray(xx / w), jnp.full((h, w), 0.5)]
    )[None]
    masks = np.zeros((1, 1, h, w), np.float32)
    masks[:, :, 128:384, 128:384] = 1.0  # 1 = region to repaint (reference :333)

    images = model.sample(
        texts=["a red fox sitting in the grass"],
        n_steps=50,
        guidance_scale=7.5,
        size=(h, w),
        key=jax.random.PRNGKey(0),
        init_images=init_images,
        inpainting_masks=jnp.asarray(masks),
        mask_blur=4.0,          # gaussian blur of the latent mask (reference :329)
        replace_diffused=True,  # re-inject known region each step (reference :477)
    )
    utils.pil_image(images.clip(0.0, 1.0)).save("stable_diffusion_inpainting.png")
    print("wrote stable_diffusion_inpainting.png")


if __name__ == "__main__":
    main()
