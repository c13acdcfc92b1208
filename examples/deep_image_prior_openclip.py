"""DeepImagePrior + OpenCLIP text-to-image optimization at 256px.

One of the BASELINE.json reference configs: the DIP skip-net
reparameterizes the image (reference perceptor/drawers/deep_image_prior.py:8-23)
and an OpenCLIP prompt-bank loss steers it toward a text prompt
(reference perceptor/losses/open_clip.py). The reference runs this as a
per-step Python loop; here the WHOLE optimization — DIP synthesis,
OpenCLIP encode, spherical distance, VJP through all of it, Adam update,
times n_steps — compiles into ONE lax.scan program (engine.run_on_device).

Run: python examples/deep_image_prior_openclip.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax
import optax

from perceptor_tpu import drawers, engine, losses, utils


def main():
    drawer = drawers.DeepImagePrior(size=(256, 256), seed=0)

    clip_loss = losses.OpenCLIP("ViT-B-32", "laion2b_s34b_b79k")
    try:
        clip_loss.add_texts_(["a watercolor painting of a fox"])
    except FileNotFoundError:
        # no BPE vocab on disk (offline environment): guide toward a fixed
        # random direction instead — same compute, no tokenizer needed
        target = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        clip_loss.add_encodings_(target)

    # drawer.loss (the DIP L1 residual penalty, reference :22-23) joins the
    # fused objective automatically
    params, history = engine.run_on_device(
        drawer,
        [clip_loss],
        drawer.params,
        n_steps=200,
        optimizer=optax.adam(0.01),
    )
    print(f"loss: {history[0]:.4f} -> {history[-1]:.4f}")

    image = drawer.synthesize(params).clip(0.0, 1.0)
    utils.pil_image(image).save("deep_image_prior_openclip.png")
    print("wrote deep_image_prior_openclip.png")


if __name__ == "__main__":
    main()
