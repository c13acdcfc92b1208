"""CLIP-guided VelocityDiffusion (yfcc_2) sampling at 256px, 50 steps.

One of the BASELINE.json reference configs: crowsonkb v-diffusion with
CLIP guidance (the reference's user loop over
`model.predictions(...).guided(grad).step(...)`,
reference perceptor/models/velocity_diffusion/predictions.py:68-155).

`engine.guided_sample` fuses the whole guided loop — velocity UNet
forward, CLIP encode of the denoised prediction, VJP back to the
diffused images, `.guided()`, DDIM step, times n_steps — into ONE
lax.scan program; it is model-generic over the continuous-t velocity
algebra and the indexed-eps families alike.

Run: python examples/velocity_guided_sample.py
     (yfcc_2 is 512px-native; 256px keeps the demo light — pass
      size=(512, 512) for the full checkpoint resolution)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax
import jax.numpy as jnp

from perceptor_tpu import engine, losses, utils
from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion


def main():
    model = VelocityDiffusion("yfcc_2", fp16=False)

    clip_loss = losses.CLIP("ViT-B-32")
    try:
        clip_loss.add_texts_(["a watercolor painting of a fox"])
    except FileNotFoundError:
        target = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        clip_loss.add_encodings_(target)

    diffused = model.random_diffused((1, 3, 256, 256), jax.random.PRNGKey(0))
    pairs = jnp.asarray(model.schedule_ts(n_steps=50), jnp.float32)

    final, history = engine.guided_sample(
        model, [clip_loss], diffused, pairs, guidance_scale=0.5,
    )
    print(f"guidance loss: {history[0]:.4f} -> {history[-1]:.4f}")

    images = model.predictions(final, pairs[-1, 1]).denoised_images
    utils.pil_image(images.clip(0.0, 1.0)).save("velocity_guided_sample.png")
    print("wrote velocity_guided_sample.png")


if __name__ == "__main__":
    main()
