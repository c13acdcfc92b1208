"""DIP (config 2) cost-split study: where do the milliseconds go?

Round-4 per-family MFU measurement put dip (DeepImagePrior + OpenCLIP,
256px guided opt) at 6.8% counted MFU — the lowest row. Note the bench
config (like the reference's model default, reference
deep_image_prior.py:21) runs offset_type="none": NO deformable convs —
so the cost is in the plain SkipNet + OpenCLIP step itself.

Components measured on the real TPU at the bench shape:
  A  SkipNet fwd + input-VJP, as shipped (reflect-pad convs + train-mode
     BatchNorm, 192ch, 256px, batch 1)
  B  same, reflect padding -> SAME zero padding (fusable by XLA; the
     reflect pad materializes a +2 copy between every conv)
  C  same as A, TrainBatchNorm -> identity (isolates the BN reductions)
  D  deform variant (offset_type="1x1") for contrast — the opt-in HQ
     mode's bilinear-gather cost
  E  OpenCLIP ViT-B-32 image fwd+VJP at 224px batch 1 (the loss tower)

Run:  python scripts/ab_deform_conv.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import perceptor_tpu.models.deep_image_prior as dip_lib


def _sync(t):
    leaf = jax.tree.leaves(t)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def measure_skipnet(label, offset_type="none", reps=30):
    model = dip_lib.DeepImagePrior(
        shape=(64, 256, 256), seed=0, offset_type=offset_type
    )
    latents = model.random_latents(jax.random.PRNGKey(0))

    def loss(params, latents):
        return jnp.mean(jnp.square(model.apply_fn(params, latents)))

    grad = jax.jit(jax.grad(loss))
    t0 = time.time()
    g = grad(model.params, latents)
    _sync(g)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        g = grad(model.params, latents)
    _sync(g)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label}: {ms:.2f} ms fwd+VJP (compile {compile_s:.0f}s)", flush=True)
    return ms


def measure_openclip(reps=30):
    from perceptor_tpu.models.open_clip import OpenCLIP

    clip = OpenCLIP.__wrapped__("ViT-B-32", "openai")
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 224, 224))

    def loss(images):
        return jnp.mean(jnp.square(clip.encode_images(images)))

    grad = jax.jit(jax.grad(loss))
    _sync(grad(images))
    t0 = time.time()
    for _ in range(reps):
        g = grad(images)
    _sync(g)
    ms = (time.time() - t0) / reps * 1e3
    print(f"E OpenCLIP 224px b1 fwd+VJP: {ms:.2f} ms", flush=True)
    return ms


def _same_conv(x, features, kernel, dtype, name):
    from flax import linen as nn

    return nn.Conv(
        features, (kernel, kernel), padding="SAME", dtype=dtype, name=name
    )(x)


def _identity_bn(self, x):
    return x


if __name__ == "__main__":
    print(f"# device: {jax.devices()[0]}", flush=True)
    a = measure_skipnet("A shipped (reflect pad, train BN)")

    orig_reflect = dip_lib._reflect_conv
    dip_lib._reflect_conv = _same_conv
    try:
        b = measure_skipnet("B SAME pad")
    finally:
        dip_lib._reflect_conv = orig_reflect

    orig_bn = dip_lib.TrainBatchNorm.__call__
    dip_lib.TrainBatchNorm.__call__ = _identity_bn
    try:
        c = measure_skipnet("C no BatchNorm")
    finally:
        dip_lib.TrainBatchNorm.__call__ = orig_bn

    d = measure_skipnet("D deform (offset_type=1x1, opt-in HQ mode)",
                        offset_type="1x1")
    e = measure_openclip()
    print(
        f"# split: reflect-pad {a - b:+.2f} ms, batchnorm {a - c:+.2f} ms, "
        f"deform-gathers (opt-in) {d - a:+.2f} ms, clip tower {e:.2f} ms, "
        f"skipnet {a:.2f} ms of the ~23.3 ms bench step",
        flush=True,
    )
