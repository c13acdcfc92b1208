"""GuidedDiffusion pixelart + stacked BLIP/CLOOB/SLIP losses, then LDM
super-resolution — the BASELINE.json ensemble config.

Stage 1: the 256px ADM "pixelart" checkpoint sampled under an ENSEMBLE of
perception losses (the reference pattern of summing several prompt-bank
losses in the user loop, SURVEY §3.1/§3.3) — here all three towers, their
VJPs, the guided update and the DDIM step fuse into ONE lax.scan program.

Stage 2: the latent-diffusion BSR model (reference
perceptor/models/latent_diffusion/super_resolution.py:99-175) upscales the
result, again as one fused sampler program.

Run: python examples/pixelart_ensemble_super_resolution.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax
import jax.numpy as jnp

from perceptor_tpu import engine, losses, utils
from perceptor_tpu.models.guided_diffusion import GuidedDiffusion
from perceptor_tpu.models.latent_diffusion import SuperResolution


def main():
    model = GuidedDiffusion("pixelart", fp16=False)

    prompt = "pixel art of a knight in a forest"
    ensemble = [losses.BLIP(), losses.CLOOB(), losses.SLIP()]
    for loss in ensemble:
        try:
            loss.add_texts_([prompt])
        except FileNotFoundError:
            # offline environment without the tower's tokenizer assets:
            # guide toward a fixed random direction instead
            dim = loss.model.encode_images(
                jnp.zeros((1, 3, 64, 64))
            ).shape[-1]
            loss.add_encodings_(
                jax.random.normal(jax.random.PRNGKey(1), (1, dim))
            )

    diffused = model.random_diffused((1, 3, 256, 256), jax.random.PRNGKey(0))
    pairs = jnp.asarray(model.schedule_indices(n_steps=50, rho=3.0))

    final, history = engine.guided_sample(
        model, ensemble, diffused, pairs,
        guidance_scale=0.5, loss_weights=[1.0, 1.0, 1.0],
    )
    print(f"ensemble loss: {history[0]:.4f} -> {history[-1]:.4f}")
    images = model.predictions(final, int(pairs[-1, 1])).denoised_images

    # stage 2: 4x LDM super-resolution (BSR), one fused sampler program
    bsr = SuperResolution(fp16=False)
    hr_canvas = bsr.upsample(images)
    upscaled = bsr.sample(hr_canvas, n_steps=50, key=jax.random.PRNGKey(2))

    utils.pil_image(upscaled.clip(0.0, 1.0)).save(
        "pixelart_ensemble_super_resolution.png"
    )
    print("wrote pixelart_ensemble_super_resolution.png")


if __name__ == "__main__":
    main()
