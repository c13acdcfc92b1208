"""DeepCache-style UNet block caching (arXiv:2312.03209, opt-in).

Invariants:
  1. The full path is numerically unchanged (return_cache only adds an
     output).
  2. A partial pass against a cache captured at the SAME (latents, t)
     reproduces the full output exactly — the shallow path covers every
     layer outside the cached deep U.
  3. A cached sampling scan (interval k) stays close to the exact scan
     on a tiny config, and params are shared between both paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu.models.stable_diffusion import UNet, config as sd_config


def _setup():
    cfg = sd_config.TINY_UNET
    module = UNet(cfg)
    latents = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
    ts = jnp.array([500.0, 100.0])
    context = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.context_dim))
    params = module.init(jax.random.PRNGKey(2), latents, ts, context)["params"]
    return module, params, latents, ts, context


def test_full_path_unchanged_and_cache_returned():
    module, params, latents, ts, context = _setup()
    baseline = module.apply({"params": params}, latents, ts, context)
    out, cache = module.apply(
        {"params": params}, latents, ts, context, return_cache=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(baseline))
    assert cache.ndim == 4 and cache.shape[0] == 2


def test_partial_pass_with_fresh_cache_is_exact():
    module, params, latents, ts, context = _setup()
    full, cache = module.apply(
        {"params": params}, latents, ts, context, return_cache=True
    )
    partial = module.apply({"params": params}, latents, ts, context, cache=cache)
    np.testing.assert_allclose(np.asarray(partial), np.asarray(full), atol=1e-5)


def test_cached_scan_close_to_exact():
    """Interval-2 caching inside one jitted scan: lax.cond picks full vs
    partial; result stays close to exact sampling on the tiny config."""
    module, params, latents, ts, context = _setup()
    from perceptor_tpu.predictions import LatentIndexedEpsPredictions
    from perceptor_tpu.schedules import scaled_linear_alphas_sigmas

    alphas, sigmas = map(jnp.asarray, scaled_linear_alphas_sigmas())
    indices = jnp.array([[800, 600], [600, 400], [400, 200], [200, 50]])

    def step(latents, idx, cache, use_cache):
        def full(_):
            return module.apply(
                {"params": params}, latents, idx[0] * 1.0, context,
                return_cache=True,
            )

        def partial(c):
            return (
                module.apply(
                    {"params": params}, latents, idx[0] * 1.0, context, cache=c
                ),
                c,
            )

        noise, cache = jax.lax.cond(use_cache, partial, full, cache)
        predictions = LatentIndexedEpsPredictions(
            from_diffused_latents=latents,
            from_indices=jnp.full((latents.shape[0],), idx[0]),
            predicted_noise=noise,
            schedule_alphas=alphas,
            schedule_sigmas=sigmas,
        )
        return predictions.step(jnp.full((latents.shape[0],), idx[1])), cache

    @jax.jit
    def run(latents, interval):
        _, cache0 = module.apply(
            {"params": params}, latents, indices[0, 0] * 1.0, context,
            return_cache=True,
        )

        def body(carry, inp):
            latents, cache = carry
            i, idx = inp
            use_cache = (i % interval) != 0
            latents, cache = step(latents, idx, cache, use_cache)
            return (latents, cache), None

        (latents, _), _ = jax.lax.scan(
            body, (latents, cache0), (jnp.arange(len(indices)), indices)
        )
        return latents

    exact = run(latents, 1)
    cached = run(latents, 2)
    err = float(jnp.abs(cached - exact).max())
    base = float(jnp.abs(exact).max())
    assert err < 0.35 * base, f"cached sampling diverged: {err} vs scale {base}"
    assert err > 0.0  # the partial path genuinely ran


def test_sample_with_cache_interval():
    """StableDiffusion.sample(cache_interval=k) runs end-to-end on the
    tiny config and stays close to exact sampling; k=1 is unchanged."""
    import numpy as np
    import pytest

    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion(
        name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
    )
    kwargs = dict(
        texts=["a test"], n_steps=6, size=(64, 64),
        key=jax.random.PRNGKey(0),
    )
    exact = model.sample(**kwargs)
    cached = model.sample(**kwargs, cache_interval=3)
    assert cached.shape == exact.shape
    err = float(jnp.abs(cached - exact).max())
    assert 0.0 < err < 1.0, err  # differs (partial path ran) but bounded

    same = model.sample(**kwargs, cache_interval=1)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(exact))

    with pytest.raises(ValueError):
        model.sample(**kwargs, cache_interval=2, n_resample=1)
