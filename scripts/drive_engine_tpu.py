"""Drive the engine surfaces end-to-end on the real TPU (tiny configs).

Exercises, through the public API on device:
- guided_sample memoization: two calls, one compiled run, with a
  mul_() mutation between them that must take effect without retrace.
- plain-callable losses: not memoized, state changes honored.
- finetuneable_vae: grads flow, restore on exit.
- batch>1 sampling through sample().

Run: python scripts/drive_engine_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perceptor_tpu import engine
from perceptor_tpu.losses.open_clip import OpenCLIP
from perceptor_tpu.models.clip import CLIPConfig
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.stable_diffusion import StableDiffusion

TINY_CLIP = CLIPConfig(
    embed_dim=16, image_size=(32, 32), patch_size=8, vision_width=24,
    vision_layers=2, vision_heads=2, context_length=12, vocab_size=64,
    text_width=20, text_layers=2, text_heads=2, quick_gelu=True,
)


def main():
    print("devices:", jax.devices(), flush=True)
    try:
        tokenizer = SimpleTokenizer()
    except FileNotFoundError:
        tokenizer = SimpleTokenizer(merges=[])
    model = StableDiffusion("tiny", fp16=False, tokenizer=tokenizer)

    clip_loss = OpenCLIP("ViT-B-32", "test", config=TINY_CLIP)
    clip_loss.add_encodings_(
        jax.random.normal(jax.random.PRNGKey(1), (1, TINY_CLIP.embed_dim))
    )

    cond = model.conditioning(["a drive test"])
    pairs = model.schedule_indices(n_steps=4, from_index=900, to_index=100)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))

    t0 = time.time()
    _, h1 = engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=cond, guidance_scale=0.3
    )
    print(f"guided_sample #1 (compile): {time.time() - t0:.1f}s "
          f"history {float(h1[0]):.5f} -> {float(h1[-1]):.5f}", flush=True)

    clip_loss.mul_(2.0)
    t0 = time.time()
    _, h2 = engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=cond, guidance_scale=0.3
    )
    dt = time.time() - t0
    ratio = float(h2[0]) / float(h1[0])
    n_runs = len(model._guided_runs)
    print(f"guided_sample #2 (memoized): {dt:.2f}s, first-step loss ratio "
          f"{ratio:.4f} (want 2.0), compiled runs {n_runs} (want 1)", flush=True)
    assert n_runs == 1, n_runs
    assert abs(ratio - 2.0) < 1e-3, ratio

    # finetuneable_vae on device
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8))
    base = model.decode(lat)
    with model.finetuneable_vae() as m:
        g = jax.grad(
            lambda vp: jnp.square(m.decode_fn({**m.params, "vae": vp}, lat)).mean()
        )(m.params["vae"])
        gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
        m.params = {**m.params, "vae": jax.tree.map(lambda p: p + 0.01, m.params["vae"])}
        changed = float(jnp.max(jnp.abs(m.decode(lat) - base)))
    restored = float(jnp.max(jnp.abs(model.decode(lat) - base)))
    print(f"finetuneable_vae: grad L1 {gnorm:.3e}, changed {changed:.3e} "
          f"(want >0), restored delta {restored:.3e} (want 0)", flush=True)
    assert gnorm > 0 and changed > 0 and restored == 0.0

    # batch>1 end-to-end sample
    t0 = time.time()
    images = model.sample(
        texts=["a", "b"], n_steps=3, guidance_scale=3.0, size=(64, 64),
        key=jax.random.PRNGKey(3),
    )
    lo, hi = float(jnp.min(images)), float(jnp.max(images))
    std = float(jnp.std(images))
    print(f"sample batch=2: {time.time() - t0:.1f}s shape {images.shape} "
          f"range [{lo:.3f}, {hi:.3f}] std {std:.4f}", flush=True)
    assert images.shape[0] == 2 and std > 0

    print("DRIVE OK", flush=True)


if __name__ == "__main__":
    main()
