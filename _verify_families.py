import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices())

# ADM tiny: forward + grad through the fused scale-shift GN
from perceptor_tpu.models.guided_diffusion import GuidedDiffusion
gd = GuidedDiffusion("tiny")
x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
p = gd.predictions(x, jnp.array([100, 500]))
stepped = p.step(jnp.array([80, 450]))
assert np.isfinite(np.asarray(stepped)).all()
g = jax.grad(lambda x: float(0) + jnp.sum(jnp.square(gd.predicted_noise_fn(gd.params, x, jnp.array([100., 500.])))))(x) if hasattr(gd, "predicted_noise_fn") else None
print("ADM ok", stepped.shape)

# velocity tiny: diffuse/denoise + grad via public API
from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion
vd = VelocityDiffusion("tiny")
xs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
ts = jnp.array([0.7, 0.3])
pred = vd.predictions(xs, ts)
den = pred.denoised_xs
assert np.isfinite(np.asarray(den)).all()
def loss(xs):
    return jnp.sum(jnp.square(vd.predictions(xs, ts).denoised_xs))
g = jax.grad(loss)(xs)
assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
print("velocity ok", den.shape)

# monster tiny: EDM sample a few steps
from perceptor_tpu.models.monster_diffusion import MonsterDiffusion
md = MonsterDiffusion("tiny")
out = md.sample(2, n_evaluations=6, key=jax.random.PRNGKey(2))
assert np.isfinite(np.asarray(out)).all()
print("monster ok", out.shape)
print("FAMILY VERIFY OK")
