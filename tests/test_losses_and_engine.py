import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from perceptor_tpu import drawers, engine, losses
from tests.test_clip import TINY


@pytest.fixture(scope="module")
def clip_loss():
    from perceptor_tpu.losses.open_clip import OpenCLIP

    loss = OpenCLIP("ViT-B-32", "test", config=TINY)
    rng = np.random.default_rng(0)
    loss.add_encodings_(rng.normal(size=(2, TINY.embed_dim)).astype(np.float32))
    return loss


def test_prompt_bank_builders(clip_loss):
    assert clip_loss.encodings.shape == (2, TINY.embed_dim)
    # norms are 1 after add
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(clip_loss.encodings), axis=-1), 1.0, atol=1e-5
    )
    clip_loss2 = type(clip_loss)("ViT-B-32", "test", config=TINY)
    clip_loss2.add_encodings_(np.ones((1, TINY.embed_dim), np.float32), weights=2.0)
    clip_loss2.add_encodings_(np.ones((3, TINY.embed_dim), np.float32), [1.0, 2.0, 3.0])
    assert clip_loss2.bank_weights.shape == (4,)
    np.testing.assert_allclose(clip_loss2.bank_weights, [2, 1, 2, 3])


def test_loss_scalar_and_grad(clip_loss):
    images = jnp.ones((1, 3, 48, 48)) * 0.4
    value = clip_loss(images)
    assert value.shape == ()
    grad = jax.grad(lambda im: clip_loss(im))(images)
    assert bool(jnp.any(grad != 0))


def test_smoothness_known_value():
    images = jnp.stack(
        [jnp.broadcast_to(jnp.linspace(0, 1, 8), (8, 8))] * 3
    )[None]
    value = losses.Smoothness()(images)
    # horizontal gradient = 1/7 everywhere; vertical = 0
    np.testing.assert_allclose(float(value), (1 / 7) ** 2, rtol=1e-5)


def test_resize_loss_zero_for_same():
    images = jnp.ones((1, 3, 16, 16)) * 0.3
    assert float(losses.Resize(size=(8, 8))(images, images)) == 0.0


def test_raw_drawer_and_inits():
    drawer = drawers.Raw(jnp.zeros((1, 3, 32, 32)))
    assert drawer.synthesize().shape == (1, 3, 32, 32)
    fractal = drawers.Raw.random_fractal_image((1, 3, 64, 64), seed=0)
    assert fractal.params.shape == (1, 3, 64, 64)
    assert 0 <= float(fractal.params.min()) and float(fractal.params.max()) <= 1
    gradient = drawers.Raw.random_gradient_image((2, 3, 32, 32), seed=0)
    assert gradient.params.shape == (2, 3, 32, 32)
    # deterministic under the same seed
    gradient2 = drawers.Raw.random_gradient_image((2, 3, 32, 32), seed=0)
    np.testing.assert_allclose(gradient.params, gradient2.params)
    # encode = resize into the grid
    encoded = drawer.encode(jnp.ones((1, 3, 64, 64)))
    assert encoded.shape == (1, 3, 32, 32)


def test_guided_optimization_m0(clip_loss):
    """M0 end-to-end: Raw drawer + CLIP-family loss + smoothness, jitted."""
    drawer = drawers.Raw(jnp.full((1, 3, 48, 48), 0.5))
    drawer, history = engine.optimize(
        drawer,
        [clip_loss, losses.Smoothness()],
        n_steps=10,
        optimizer=optax.adam(0.05),
    )
    assert len(history) == 10
    assert history[-1] < history[0]  # loss decreases


def test_run_on_device_scan(clip_loss):
    """Whole loop as one lax.scan program."""
    drawer = drawers.Raw(jnp.full((1, 3, 48, 48), 0.5))
    params, history = engine.run_on_device(
        drawer.synthesize, [clip_loss], drawer.params, n_steps=8
    )
    assert params.shape == drawer.params.shape
    assert history.shape == (8,)
    assert float(history[-1]) < float(history[0])


def test_guided_sample_scan(clip_loss):
    """Whole guided DDIM sampling loop as one lax.scan program (tiny SD)."""
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion(name="tiny", tokenizer=SimpleTokenizer(merges=[]))
    conditioning = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=4, from_index=800, to_index=100)
    key = jax.random.PRNGKey(0)
    latents = model.random_diffused_latents((1, 32, 32), key)
    final, history = engine.guided_sample(
        model,
        [clip_loss],
        latents,
        pairs,
        conditioning=conditioning,
        guidance_scale=0.2,
    )
    assert final.shape == latents.shape
    assert history.shape == (pairs.shape[0],)
    assert bool(jnp.all(jnp.isfinite(final)))
    # the guided trajectory must differ from the unguided one
    unguided, _ = engine.guided_sample(
        model, [clip_loss], latents, pairs,
        conditioning=conditioning, guidance_scale=0.0,
    )
    assert bool(jnp.any(jnp.abs(final - unguided) > 1e-6))


def test_textoff_vectors_shipped():
    """The per-arch textoff table ships in-package (reference
    perceptor/losses/clip/vectors/textoff.json) and add_text_off_ loads it."""
    import json

    from perceptor_tpu.losses.clip import _TEXTOFF_PATH, CLIP as CLIPLoss
    from perceptor_tpu.losses.prompt_bank import PromptBankLoss

    table = json.load(open(_TEXTOFF_PATH))
    for arch in ("RN50", "RN101", "RN50x4", "RN50x16", "ViT-B-32", "ViT-B-16"):
        assert arch in table

    # exercise add_text_off_ without constructing the heavyweight tower:
    # the method only touches self.name and the prompt bank
    loss = CLIPLoss.__new__(CLIPLoss)
    PromptBankLoss.__init__(loss, model=None)
    loss.name = "ViT-B-32"
    loss.add_text_off_(weight=0.5)
    assert loss.encodings.shape == (1, 512)
    assert float(loss.bank_weights[0]) == 0.5
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(loss.encodings)), 1.0, atol=1e-5
    )

    loss.name = "nonexistent-arch"
    with pytest.raises(ValueError):
        loss.add_text_off_()


def _tiny_sd():
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    return StableDiffusion(
        name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
    )


def test_guided_sample_options_match_stepwise_algebra(clip_loss):
    """correction/threshold/eta flags compose exactly the per-step algebra
    methods the reference's user loops call (VelocityDiffusion
    predictions.py: step/correction/dynamic_threshold)."""
    model = _tiny_sd()
    conditioning = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=3, from_index=800, to_index=200)
    key = jax.random.PRNGKey(0)
    latents0 = model.random_diffused_latents((1, 32, 32), key)

    final, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=conditioning,
        guidance_scale=0.3, correction=True, threshold="dynamic",
        threshold_quantile=0.9, clamp_value=1.0,
    )

    # manual stepwise composition through the public algebra
    def loss_grad(latents, from_idx):
        def f(latents):
            predictions = model.predictions_fn(
                model.params, latents, from_idx, conditioning
            )
            return clip_loss.apply(
                clip_loss.loss_params, predictions.denoised_images
            )
        return jax.grad(f)(latents)

    latents = latents0
    for pair in np.asarray(pairs):
        from_idx, to_idx = (
            jnp.asarray([pair[0]]), jnp.asarray([pair[1]]),
        )
        grads = loss_grad(latents, from_idx)
        predictions = model.predictions_fn(
            model.params, latents, from_idx, conditioning
        )
        guided = predictions.guided(
            grads, 0.3, clamp_value=1.0
        ).dynamic_threshold(0.9)
        stepped = guided.step(to_idx)
        predictions2 = model.predictions_fn(
            model.params, stepped, to_idx, conditioning
        )
        corrected = predictions2.correction(guided).dynamic_threshold(0.9)
        latents = corrected.step(to_idx)

    np.testing.assert_allclose(
        np.asarray(final), np.asarray(latents), atol=1e-5
    )


def test_guided_sample_memoizes_per_static_config(clip_loss):
    model = _tiny_sd()
    model.__dict__.pop("_guided_runs", None)
    conditioning = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    for scale in (0.1, 0.5, 0.9):
        engine.guided_sample(
            model, [clip_loss], latents, pairs, conditioning=conditioning,
            guidance_scale=scale,
        )
    assert len(model._guided_runs) == 1  # traced arg, one executable
    engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=conditioning,
        correction=True,
    )
    assert len(model._guided_runs) == 2  # new static structure


def test_guided_sample_memo_honors_loss_mutation(clip_loss):
    """Loss state mutated between calls (mul_) must take effect without a
    retrace: the multiplier rides in the traced loss_params, so the
    memoized executable sees the new value."""
    model = _tiny_sd()
    model.__dict__.pop("_guided_runs", None)
    conditioning = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    _, history1 = engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=conditioning,
        guidance_scale=0.2,
    )
    clip_loss.mul_(2.0)
    try:
        _, history2 = engine.guided_sample(
            model, [clip_loss], latents, pairs, conditioning=conditioning,
            guidance_scale=0.2,
        )
    finally:
        clip_loss.mul_(0.5)
    assert len(model._guided_runs) == 1  # same executable...
    # ...but the first step (identical initial latents) sees 2x the loss
    np.testing.assert_allclose(
        float(history2[0]), 2.0 * float(history1[0]), rtol=1e-5
    )


def test_guided_sample_plain_callable_not_memoized():
    """Losses without the pure (apply, loss_params) protocol close over
    their state at trace time, so guided_sample must NOT cache them."""
    model = _tiny_sd()
    model.__dict__.pop("_guided_runs", None)
    conditioning = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    state = {"scale": 1.0}

    def plain_loss(images):
        return state["scale"] * jnp.mean(jnp.square(images))

    _, history1 = engine.guided_sample(
        model, [plain_loss], latents, pairs, conditioning=conditioning,
        guidance_scale=0.2,
    )
    assert not model.__dict__.get("_guided_runs")
    state["scale"] = 3.0
    _, history2 = engine.guided_sample(
        model, [plain_loss], latents, pairs, conditioning=conditioning,
        guidance_scale=0.2,
    )
    np.testing.assert_allclose(
        float(history2[0]), 3.0 * float(history1[0]), rtol=1e-5
    )


def test_guided_sample_n_resample_and_eta(clip_loss):
    model = _tiny_sd()
    conditioning = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    final, history = engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=conditioning,
        n_resample=2, eta=0.7, key=jax.random.PRNGKey(1),
    )
    assert final.shape == latents.shape
    assert bool(jnp.all(jnp.isfinite(final)))
    assert history.shape == (2,)


def test_guided_sample_mesh_matches_unsharded(clip_loss):
    """8-way data-sharded guided sampling == unsharded (item: mesh-aware
    engine; TP rules demote on tiny shapes, DP shards the batch)."""
    from perceptor_tpu import parallel

    model = _tiny_sd()
    mesh = parallel.create_mesh(data=4, tensor=2)
    conditioning = model.conditioning(["a test"] * 8)
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((8, 32, 32), jax.random.PRNGKey(0))
    expected, _ = engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=conditioning,
        guidance_scale=0.3, clamp_value=1.0,
    )
    sharded, _ = engine.guided_sample(
        model, [clip_loss], latents, pairs, conditioning=conditioning,
        guidance_scale=0.3, clamp_value=1.0, mesh=mesh,
    )
    # GSPMD collectives reassociate reductions: small fp drift expected
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), atol=1e-4
    )


def test_guided_sample_drives_velocity_family(clip_loss):
    """engine.guided_sample is model-generic: drive the velocity family
    (continuous-t predictions_fn) through the same fused loop."""
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion(name="tiny", fp16=False)
    pairs = jnp.asarray(model.schedule_ts(n_steps=3), jnp.float32)
    diffused = model.random_diffused((1, *model.shape), jax.random.PRNGKey(0))
    final, history = engine.guided_sample(
        model, [clip_loss], diffused, pairs, guidance_scale=0.3,
    )
    assert final.shape == diffused.shape
    assert history.shape == (pairs.shape[0],)
    assert bool(jnp.all(jnp.isfinite(final)))


def test_guided_sample_drives_adm_family(clip_loss):
    """...and the ADM (indexed-eps pixel) family."""
    from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

    model = GuidedDiffusion(name="tiny", fp16=False)
    pairs = jnp.asarray(model.schedule_indices(n_steps=3, rho=3.0))
    diffused = model.random_diffused((1, 3, 32, 32), jax.random.PRNGKey(0))
    final, history = engine.guided_sample(
        model, [clip_loss], diffused, pairs, guidance_scale=0.3,
    )
    assert final.shape == diffused.shape
    assert bool(jnp.all(jnp.isfinite(final)))


def test_drawer_param_penalty_joins_fused_objective():
    """A drawer exposing `loss(params)` (DeepImagePrior's L1 residual,
    reference drawers/deep_image_prior.py:22-23) contributes to the fused
    total in both make_guidance_step and run_on_device."""
    drawer = drawers.DeepImagePrior(size=(16, 16), seed=0)

    def image_loss(images):
        return jnp.square(images).mean()

    # run_on_device path: gradient of the penalty must reach the residual
    # images param even when the image loss is insensitive to it
    params, history = engine.run_on_device(
        drawer, [image_loss], drawer.params, n_steps=2
    )
    assert bool(jnp.all(jnp.isfinite(history)))

    # the penalty value itself is in the reported total: compare the fused
    # total against the image loss alone at the initial params
    step, frozen = engine.make_guidance_step(
        drawer, [image_loss], optax.sgd(0.0)
    )
    opt_state = optax.sgd(0.0).init(drawer.params)
    _, _, aux = step(drawer.params, opt_state, frozen)
    expected_total = image_loss(drawer.synthesize(drawer.params)) + drawer.loss(
        drawer.params
    )
    np.testing.assert_allclose(
        float(aux["loss"]), float(expected_total), rtol=1e-5
    )


def test_guided_sample_cfg_matches_stepwise_algebra(clip_loss):
    """uncond_conditioning/cfg_scale compose classifier-free guidance with
    the loss guidance exactly as the reference's SD user loop does
    (SURVEY §3.3 + §3.4): two model evals, CFG-combine, loss VJP through
    the combined denoised images, guided(), step."""
    model = _tiny_sd()
    cond = model.conditioning(["a test"])
    uncond = model.conditioning([""])
    pairs = model.schedule_indices(n_steps=3, from_index=800, to_index=200)
    latents0 = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))

    final, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0,
        uncond_conditioning=uncond, cfg_scale=4.0,
    )

    def cfg_predictions(latents, from_idx):
        pred_u = model.predictions_fn(model.params, latents, from_idx, uncond)
        pred_c = model.predictions_fn(model.params, latents, from_idx, cond)
        return pred_u.classifier_free_guidance(pred_c, 4.0)

    latents = latents0
    for pair in np.asarray(pairs):
        from_idx, to_idx = jnp.asarray([pair[0]]), jnp.asarray([pair[1]])

        def f(latents):
            predictions = cfg_predictions(latents, from_idx)
            return clip_loss.apply(
                clip_loss.loss_params, predictions.denoised_images
            )

        grads = jax.grad(f)(latents)
        guided = cfg_predictions(latents, from_idx).guided(
            grads, 0.3, clamp_value=1.0
        )
        latents = guided.step(to_idx)

    # two separately-compiled f32 programs: reassociation differences are
    # amplified by cfg_scale and compound across the trajectory, so the
    # bar is looser than the single-conditioning test's 1e-5
    np.testing.assert_allclose(np.asarray(final), np.asarray(latents), atol=2e-3)
    # CFG trajectory differs from the single-conditioning one
    plain, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0,
    )
    assert bool(jnp.any(jnp.abs(final - plain) > 1e-6))


def test_guided_sample_cfg_scale_is_traced(clip_loss):
    model = _tiny_sd()
    model.__dict__.pop("_guided_runs", None)
    cond = model.conditioning(["a test"])
    uncond = model.conditioning([""])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    for scale in (1.0, 4.0, 7.5):
        engine.guided_sample(
            model, [clip_loss], latents, pairs, conditioning=cond,
            uncond_conditioning=uncond, cfg_scale=scale,
        )
    assert len(model._guided_runs) == 1  # traced arg, one executable


def test_guided_sample_preview_mode(clip_loss):
    """loss_images='preview' guides through the linear latent->RGB preview
    (no VAE in the loss VJP); trajectory is finite and differs from the
    decoded mode, and the preview itself is the published 4x3 map."""
    from perceptor_tpu.models.stable_diffusion.stable_diffusion import (
        _LATENT_RGB_FACTORS,
    )

    model = _tiny_sd()
    cond = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents0 = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))

    preview = model.preview_images_fn(latents0)
    assert preview.shape == (1, 3) + latents0.shape[-2:]
    assert float(preview.min()) >= 0.0 and float(preview.max()) <= 1.0
    want = np.einsum(
        "nchw,cd->ndhw", np.asarray(latents0), _LATENT_RGB_FACTORS
    ) * 0.5 + 0.5
    np.testing.assert_allclose(
        np.asarray(preview), np.clip(want, 0.0, 1.0), atol=1e-6
    )

    fast, history = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0, loss_images="preview",
    )
    assert bool(jnp.all(jnp.isfinite(fast)))
    assert bool(jnp.all(jnp.isfinite(history)))
    exact, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0,
    )
    assert bool(jnp.any(jnp.abs(fast - exact) > 1e-6))


def test_guided_sample_preview_requires_capable_model(clip_loss):
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion(name="tiny", fp16=False)
    pairs = model.schedule_ts(n_steps=2)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    with pytest.raises(ValueError, match="preview"):
        engine.guided_sample(
            model, [clip_loss], latents, pairs, loss_images="preview"
        )
    with pytest.raises(ValueError, match="loss_images"):
        engine.guided_sample(
            model, [clip_loss], latents, pairs, loss_images="nope"
        )


def test_guided_sample_image_augment_cutouts(clip_loss):
    """image_augment threads fresh per-step randomness into the loss path
    (the cutout-ensemble recipe of every CLIP-guided-diffusion loop)."""
    from perceptor_tpu import transforms

    model = _tiny_sd()
    cond = model.conditioning(["a test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents0 = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))

    def augment(key, images):
        return transforms.random_cutouts(images, key, 4, cut_size=16)

    out1, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0, image_augment=augment,
    )
    out2, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0, image_augment=augment,
    )
    plain, _ = engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.3, clamp_value=1.0,
    )
    assert bool(jnp.all(jnp.isfinite(out1)))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert bool(jnp.any(jnp.abs(out1 - plain) > 1e-6))
    # the same augment callable memoizes; a different one rebuilds
    runs_before = len(model._guided_runs)
    engine.guided_sample(
        model, [clip_loss], latents0, pairs, conditioning=cond,
        guidance_scale=0.5, clamp_value=1.0, image_augment=augment,
    )
    assert len(model._guided_runs) == runs_before
