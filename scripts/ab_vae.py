"""A/B harness: VAE decode fwd + input-VJP at 512px, isolated.

Variants via env VAE_AB:
  base     — current code path
  jaximg   — nearest upsample via jax.image.resize (old path)
  compgn   — composite (non-fused) GroupNorm+SiLU
Usage: VAE_AB=base python scripts/ab_vae.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

variant = os.environ.get("VAE_AB", "base")

if variant == "jaximg":
    import perceptor_tpu.ops.upsample_conv as uc
    def _jaximg(x):
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
    uc.nearest_upsample_2x = _jaximg
    # vae imported after the patch picks up the module-level from-import
    import perceptor_tpu.models.stable_diffusion.vae as vae_mod
    vae_mod.nearest_upsample_2x = _jaximg
if variant == "im2col":
    import perceptor_tpu.ops.conv_matmul as cm
    cm.MATMUL_LOWERING = "im2col"
if variant == "compgn":
    import perceptor_tpu.ops.groupnorm as gn
    def _comp(x, scale, bias, num_groups=32, eps=1e-5, out_dtype=None):
        h = gn.group_norm(x, num_groups, scale, bias, eps)
        y = h * jax.nn.sigmoid(h)
        return y.astype(out_dtype or x.dtype)
    gn.fused_group_norm_silu = _comp

from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.core.dtypes import cast_matmul_params_bf16
from perceptor_tpu.models.stable_diffusion import AutoencoderKL, config as sd_config

vae = AutoencoderKL(sd_config.SD_V1_VAE, dtype=jnp.bfloat16)
params = init_by_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 512, 512)))["params"]
params = cast_matmul_params_bf16(params)
latents = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 64, 64))

@jax.jit
def step(params, latents):
    def f(latents):
        img = vae.apply({"params": params}, latents, method="decode")
        return jnp.sum(jnp.square(img))
    l, g = jax.value_and_grad(f)(latents)
    return l, g

@jax.jit
def loop(params, latents):
    def body(lat, _):
        l, g = step(params, lat)
        return lat - 1e-6 * g, l
    return jax.lax.scan(body, latents, None, length=10)

t0 = time.time()
out, ls = loop(params, latents)
_ = float(jnp.sum(out))
print(f"variant={variant} compile+first {time.time()-t0:.1f}s")
t0 = time.time()
out, ls = loop(params, latents)
_ = float(jnp.sum(out))
dt = time.time() - t0
print(f"variant={variant} 10 decode+VJP in {dt*1000:.1f} ms -> {dt*100:.2f} ms/step")

if os.environ.get("VAE_PROFILE") == "1":
    import tempfile
    from perceptor_tpu.utils import hlo_trace

    logdir = tempfile.mkdtemp(prefix="vae_trace_")
    with jax.profiler.trace(logdir):
        l, g = step(params, latents)
        _ = float(jnp.sum(g))
    ops = hlo_trace.load_ops(logdir)
    hlo_trace.print_rollup(ops, subsystems={"vae": "vae"}, top=25)
