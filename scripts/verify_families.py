"""Smoke-drive the three pixel-diffusion families end-to-end on the
attached device (TPU or CPU): forward, predictions algebra, and gradient
flow through each family's fused GroupNorm/attention path.

Usage: python scripts/verify_families.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

# ADM tiny: forward + grad through the fused scale-shift GN
from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

gd = GuidedDiffusion("tiny")
x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
p = gd.predictions(x, jnp.array([100, 500]))
stepped = p.step(jnp.array([80, 450]))
assert np.isfinite(np.asarray(stepped)).all()


def adm_loss(x):
    return jnp.sum(jnp.square(gd.predictions(x, jnp.array([100, 500])).denoised_xs))


g = jax.grad(adm_loss)(x)
assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
print("ADM ok", stepped.shape)

# velocity tiny: diffuse/denoise + grad via public API
from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

vd = VelocityDiffusion("tiny")
xs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
ts = jnp.array([0.7, 0.3])
den = vd.predictions(xs, ts).denoised_xs
assert np.isfinite(np.asarray(den)).all()


def velocity_loss(xs):
    return jnp.sum(jnp.square(vd.predictions(xs, ts).denoised_xs))


g = jax.grad(velocity_loss)(xs)
assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
print("velocity ok", den.shape)

# monster tiny: EDM sample a few steps
from perceptor_tpu.models.monster_diffusion import MonsterDiffusion

md = MonsterDiffusion("tiny")
out = md.sample(2, n_evaluations=6, key=jax.random.PRNGKey(2))
assert np.isfinite(np.asarray(out)).all()
print("monster ok", out.shape)
print("FAMILY VERIFY OK")
