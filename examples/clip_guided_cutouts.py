"""CLIP-guided pixels with a random-cutout guidance ensemble.

The classic CLIP-guidance recipe (every MakeCutouts notebook written on
perceptor-style libraries): per step, take N random antialiased square
crops of the synthesized image, encode ALL of them with CLIP, and minimize
the mean spherical distance to the prompt — the crop ensemble is what makes
pixel-space CLIP guidance converge instead of adversarially texturing.

TPU-first shape of the same loop: `transforms.random_cutouts` builds each
crop-resize as two MXU matmuls from traced boxes (one compiled program for
every draw), the PRNG key threads through a `lax.scan` carry, and the whole
N-step optimization is ONE XLA program — zero host round-trips. The cutout
axis is plain batch data, so on a mesh it shards over `data` for free.

Run: python examples/clip_guided_cutouts.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax
import jax.numpy as jnp
import optax

from perceptor_tpu import drawers, losses, transforms, utils


def main():
    drawer = drawers.Raw.random_fractal_image((1, 3, 256, 256), seed=0)

    clip_loss = losses.CLIP("ViT-B-32")
    try:
        clip_loss.add_texts_(["a watercolor painting of a fox"])
    except FileNotFoundError:
        # offline environment without the BPE vocab: guide toward a fixed
        # random direction instead — same compute, no tokenizer needed
        target = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        clip_loss.add_encodings_(target)

    loss_params = clip_loss.loss_params
    optimizer = optax.adam(0.05)

    def total_loss(params, loss_params, key):
        images = drawer.synthesize(params)
        cutouts = transforms.random_cutouts(
            images, key, n_cutouts=16, cut_size=224, cut_pow=0.5
        )
        return clip_loss.apply(loss_params, cutouts)

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def run(params, loss_params, key, n_steps):
        opt_state = optimizer.init(params)

        def body(carry, _):
            params, opt_state, key = carry
            key, cut_key = jax.random.split(key)
            loss, grads = jax.value_and_grad(total_loss)(
                params, loss_params, cut_key
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, _, _), history = jax.lax.scan(
            body, (params, opt_state, key), None, length=n_steps
        )
        return params, history

    params, history = run(
        drawer.params, loss_params, jax.random.PRNGKey(0), 200
    )
    history = jax.device_get(history)
    print(f"loss: {history[0]:.4f} -> {history[-1]:.4f}")

    image = jnp.clip(drawer.synthesize(params), 0.0, 1.0)
    utils.pil_image(image).save("clip_guided_cutouts.png")
    print("wrote clip_guided_cutouts.png")


if __name__ == "__main__":
    main()
