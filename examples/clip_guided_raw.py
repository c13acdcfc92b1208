"""CLIP-guided pixel optimization — the reference's README workflow.

Reference equivalent (perceptor README.md usage):

    drawer = perceptor.drawers.Raw(...).to(device)
    loss = perceptor.losses.CLIP(...).add_texts_(["..."])
    for _ in range(200):
        optimizer.zero_grad()
        loss(drawer.synthesize()).backward()
        optimizer.step()

Here the whole optimization compiles into ONE XLA program
(engine.run_on_device), so there are zero host round-trips between steps.

Run: python examples/clip_guided_raw.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax

from perceptor_tpu import drawers, engine, losses, utils


def main():
    drawer = drawers.Raw.random_fractal_image((1, 3, 256, 256), seed=0)

    clip_loss = losses.CLIP("ViT-B-32")
    try:
        clip_loss.add_texts_(["a watercolor painting of a fox"])
    except FileNotFoundError:
        # no BPE vocab on disk (offline environment): guide toward a fixed
        # random direction instead — same compute, no tokenizer needed
        target = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        clip_loss.add_encodings_(target)
    smoothness = losses.Smoothness()

    params, history = engine.run_on_device(
        drawer,
        [clip_loss, smoothness],
        drawer.params,
        n_steps=200,
        loss_weights=[1.0, 0.05],
    )
    print(f"loss: {history[0]:.4f} -> {history[-1]:.4f}")

    image = drawer.synthesize(params).clip(0.0, 1.0)
    utils.pil_image(image).save("clip_guided_raw.png")
    print("wrote clip_guided_raw.png")


if __name__ == "__main__":
    main()
