"""CLIP-guided diffusion sampling — the reference's north-star workflow
(SURVEY §3.3): per step, decode the denoised prediction, backprop the loss
to the diffused latents, bend the trajectory with `.guided()`, DDIM-step.

Reference equivalent: the user loop over
`model.predictions(...)` / `predictions.guided(grad).step(...)`
(perceptor/models/stable_diffusion/predictions.py:172-179).

Here `engine.guided_sample` fuses the WHOLE guided sampling loop — UNet
forward, VAE decode, loss encoders, the VJP through all of it, guided
update, DDIM step, times n_steps — into one lax.scan program.

Run: python examples/clip_guided_diffusion.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax

from perceptor_tpu import engine, losses, utils
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.stable_diffusion import StableDiffusion


def main():
    model = StableDiffusion(
        "runwayml/stable-diffusion-v1-5",
        tokenizer=SimpleTokenizer(merges=[]),
    )

    clip_loss = losses.CLIP("ViT-B-32")
    target = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    clip_loss.add_encodings_(target)  # or .add_texts_([...]) with a vocab

    latents = model.random_diffused_latents((1, 512, 512), jax.random.PRNGKey(0))
    pairs = model.schedule_indices(50)

    final_latents, history = engine.guided_sample(
        model,
        [clip_loss],
        latents,
        pairs,
        conditioning=model.conditioning(["a watercolor fox"]),
        guidance_scale=0.5,
    )
    print(f"guidance loss: {history[0]:.4f} -> {history[-1]:.4f}")

    images = model.decode(final_latents)
    utils.pil_image(images.clip(0.0, 1.0)).save("clip_guided_diffusion.png")
    print("wrote clip_guided_diffusion.png")


if __name__ == "__main__":
    main()
