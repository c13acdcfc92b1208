"""Fused guided-optimization steps.

The reference leaves the optimization loop to user scripts (SURVEY §3.1):
`loss(drawer.synthesize()).backward(); optimizer.step()` — one dispatch per
op, autograd tape per step. The TPU-native equivalent fuses synthesize ->
k losses -> VJP -> optimizer update into ONE compiled XLA program per step
(and `run_on_device` goes further: the whole N-step loop becomes a single
lax.scan program, so there are zero host round-trips during optimization).

The reference's manual `GradientCheckpoint` for sharing the synthesize
prefix across losses (reference perceptor/utils/gradient_checkpoint.py:57)
is obsolete here: one value_and_grad over the summed losses reuses the
prefix automatically.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


_GUIDED_MEMO_MAX = 8  # compiled guided runs kept per model instance
_RUN_ON_DEVICE_MEMO: dict = {}  # compiled whole-loop runs (run_on_device)


def _gather_frozen(synthesize, losses):
    """Collect every frozen-weights pytree the step reads, so it can be
    passed as a jit ARGUMENT. Closing over concrete device arrays inside
    an outer jit bakes them into the executable as constants — for
    multi-GB towers that is both an oversized compile payload and, through
    remote runtimes, a per-call re-upload. Losses expose
    `(apply, loss_params)` (losses/prompt_bank.py) and drawers may expose
    `(synthesize_fn, model_params)`; plain callables still work, they just
    forgo the protection."""
    synth_fn = getattr(synthesize, "synthesize_fn", None)
    synth_frozen = getattr(synthesize, "model_params", None)
    if synth_fn is None:
        synth_fn, synth_frozen = None, None
    loss_fns = []
    loss_frozen = []
    for loss in losses:
        apply_fn = getattr(loss, "apply", None)
        params = getattr(loss, "loss_params", None)
        if apply_fn is not None and params is not None:
            loss_fns.append(apply_fn)
            loss_frozen.append(params)
        else:
            loss_fns.append(None)
            loss_frozen.append(None)
    return synth_fn, synth_frozen, loss_fns, tuple(loss_frozen)


def make_guidance_step(
    synthesize,
    losses: Sequence[Callable],
    optimizer: optax.GradientTransformation,
    loss_weights: Optional[Sequence[float]] = None,
):
    """Returns (jitted step, frozen) where
    `step(params, opt_state, frozen) -> (params, opt_state, aux)`.

    `synthesize` is a drawer (preferred: its model weights are threaded
    through `frozen`) or a plain `params -> images` callable; each loss
    maps images -> scalar (prompt-bank losses thread their tower weights
    through `frozen` too).
    """
    weights = list(loss_weights) if loss_weights is not None else [1.0] * len(losses)
    synth_fn, synth_frozen, loss_fns, loss_frozen = _gather_frozen(
        synthesize, losses
    )
    synth_plain = (
        synthesize.synthesize if hasattr(synthesize, "synthesize") else synthesize
    )
    # drawer-level param penalty (DeepImagePrior's L1 residual, reference
    # drawers/deep_image_prior.py:22-23): users of the reference add
    # `drawer.loss()` to the objective; here it joins the fused total
    penalty_fn = getattr(synthesize, "loss", None)

    def total_loss(params, frozen):
        synth_p, loss_p = frozen
        if synth_fn is not None:
            images = synth_fn(synth_p, params)
        else:
            images = synth_plain(params)
        values = []
        for loss, apply_fn, lp in zip(losses, loss_fns, loss_p):
            values.append(
                apply_fn(lp, images) if apply_fn is not None else loss(images)
            )
        values = jnp.stack(values)
        total = jnp.sum(values * jnp.asarray(weights))
        if penalty_fn is not None:
            total = total + penalty_fn(params)
        return total, values

    @jax.jit
    def step(params, opt_state, frozen):
        (loss, values), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(params, frozen)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "losses": values}

    return step, (synth_frozen, loss_frozen)


def optimize(
    drawer,
    losses: Sequence[Callable],
    n_steps: int = 100,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss_weights: Optional[Sequence[float]] = None,
    callback: Optional[Callable] = None,
):
    """Host-loop convenience: optimize the drawer's params in place.

    Returns (drawer, history of total losses).
    """
    optimizer = optimizer or optax.adam(0.05)
    step, frozen = make_guidance_step(drawer, losses, optimizer, loss_weights)
    params = drawer.params
    opt_state = optimizer.init(params)
    history = []
    for i in range(n_steps):
        params, opt_state, aux = step(params, opt_state, frozen)
        history.append(aux["loss"])
        if callback is not None:
            callback(i, params, aux)
    drawer.replace_(params)
    return drawer, [float(h) for h in history]


def guided_sample(
    model,
    losses: Sequence[Callable],
    initial_latents,
    pairs,
    conditioning=None,
    guidance_scale: float = 0.5,
    loss_weights: Optional[Sequence[float]] = None,
    eta: float = 0.0,
    key=None,
    correction: bool = False,
    n_resample: int = 0,
    threshold: Optional[str] = None,
    threshold_quantile: float = 0.95,
    clamp_value: float = 1e-6,
    uncond_conditioning=None,
    cfg_scale: float = 7.0,
    loss_images: str = "decoded",
    image_augment: Optional[Callable] = None,
    mesh=None,
    rules=None,
):
    """Loss-guided DDIM sampling as ONE compiled lax.scan program.

    Per step (the reference's user-script loop, SURVEY §3.3): model
    predictions at `from_index` -> decode denoised images -> weighted loss
    sum -> VJP back through decoder+UNet to the diffused latents ->
    `.guided(grad, guidance_scale)` -> optional thresholding -> DDIM step.
    `pairs` is an (n_steps, 2) int array of (from, to) schedule indices
    (e.g. `model.schedule_indices(...)`). Model weights and loss towers
    ride as jit arguments (never constants).

    Sampling options (each maps to one predictions-algebra method the
    reference's user loops compose per step):

    - ``eta``: stochastic DDIM (``step(eta=...)``); traced, so sweeping
      values reuses one executable.
    - ``correction``: PNDM-ish second-order correction — after stepping,
      re-evaluate the model at the new point (no extra VJP) and average
      the two denoised estimates (``predictions.correction``), then
      re-step.
    - ``n_resample``: RePaint-style churn — n guided resample iterations
      per schedule step (guided grads applied before each resample, the
      `guided_resample_` pattern of reference losses/velocity_diffusion.py).
    - ``threshold``: "dynamic" (Imagen percentile clamp, with
      ``threshold_quantile``) or "static" ([-1,1] clamp) applied to the
      guided predictions before stepping.
    - ``clamp_value``: the guided() gradient clamp (reference
      predictions.py:148-155 `clamp=1e-6`). NOTE the default turns the
      gradient into ~sign(grad) — near-zero gradient elements are
      numerically chaotic across compilations; pass a larger value for a
      smooth (magnitude-preserving) guidance signal.
    - ``uncond_conditioning``/``cfg_scale``: classifier-free guidance
      composed with the loss guidance (the reference's SD user pattern,
      SURVEY §3.3 + §3.4: two model evals per step, predictions =
      ``uncond.classifier_free_guidance(cond, cfg_scale)``, then the loss
      VJP through the CFG-combined denoised images and ``guided()``).
      ``cfg_scale`` is traced — sweeping it reuses one executable.
    - ``loss_images``: what the losses see. "decoded" (default) is the
      model's full decode (``predictions.denoised_images`` — for latent
      models the VAE decode, whose input-VJP dominates the fused step's
      cost). "preview" uses the model's cheap differentiable preview
      (``model.preview_images_fn``, e.g. StableDiffusion's linear
      latent->RGB factors): approximate guidance at a fraction of the
      cost — the loss VJP skips the VAE entirely.
    - ``image_augment``: optional ``(key, images) -> images`` hook applied
      before the losses each step with fresh per-step randomness — the
      cutout-ensemble recipe (``transforms.random_cutouts``) every
      CLIP-guided-diffusion loop uses:
      ``lambda key, images: transforms.random_cutouts(images, key, 16)``.
    - ``mesh``/``rules``: shard the whole loop over a device mesh — model
      and loss-tower params partitioned by the tensor-parallel rules
      (parallel/partition.py; `rules=None` uses the defaults), the batch
      over the data axis. Single-device behavior is unchanged when None.

    Returns (final diffused latents, per-step total loss array).

    Compiled programs are memoized on the model instance per static
    configuration (losses, weights, flags) — repeated calls with different
    guidance_scale/eta/latents do not retrace. Memoization applies when
    every loss exposes the pure `(apply, loss_params)` protocol (all
    shipped losses do); mutable loss state (prompt bank, multiplier) rides
    in the traced `loss_params`, so mutations between calls take effect
    without a retrace. Plain-callable losses are rebuilt per call.
    """
    weights = tuple(loss_weights) if loss_weights is not None else (1.0,) * len(losses)
    _, _, loss_fns, loss_frozen = _gather_frozen(lambda p: p, losses)
    pairs = jnp.asarray(pairs)
    if key is None:
        key = jax.random.PRNGKey(0)
    if threshold not in (None, "dynamic", "static"):
        raise ValueError(f"threshold must be None|'dynamic'|'static', got {threshold!r}")
    if loss_images not in ("decoded", "preview"):
        raise ValueError(
            f"loss_images must be 'decoded'|'preview', got {loss_images!r}"
        )
    if loss_images == "preview" and not hasattr(model, "preview_images_fn"):
        raise ValueError(
            f"{type(model).__name__} has no preview_images_fn; "
            "loss_images='preview' needs a latent model with a cheap "
            "differentiable preview decode"
        )

    mparams = model.params
    latents = initial_latents
    plan = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        from perceptor_tpu import parallel

        shard_kwargs = {} if rules is None else {"rules": rules}
        plan = parallel.plan_for_mesh(mesh)
        mparams = parallel.shard_params(mparams, mesh, **shard_kwargs)
        loss_frozen = tuple(
            parallel.shard_params(lp, mesh, **shard_kwargs) if lp is not None else None
            for lp in loss_frozen
        )
        if plan is not None and latents.shape[2] % plan.n_context == 0:
            # context-parallel: latents sharded spatially (H over the
            # context axis); the plan routes the model's attention
            # through ring/Ulysses at trace time (parallel/plan.py)
            latents = jax.device_put(
                latents,
                NamedSharding(
                    mesh, plan.spatial_spec(latents.ndim, 2, latents.shape[0])
                ),
            )
        elif latents.shape[0] % mesh.shape[parallel.AXIS_DATA] == 0:
            latents = parallel.shard_batch(latents, mesh)
        else:
            latents = parallel.replicate(latents, mesh)
        if conditioning is not None:
            conditioning = parallel.replicate(conditioning, mesh)
        if uncond_conditioning is not None:
            uncond_conditioning = parallel.replicate(uncond_conditioning, mesh)

    stochastic = float(eta) > 0.0
    use_cfg = uncond_conditioning is not None
    # Memoize the compiled run only when every loss goes through the pure
    # (apply, loss_params) protocol: there all mutable state (tower params,
    # prompt bank, multiplier) rides in the traced loss_params argument, so
    # a cached executable can never see stale state. Plain-callable losses
    # are closed over at trace time — for those, rebuild per call (the
    # pre-memoization behavior). The memo holds strong references to the
    # loss objects, so the id()s in the key cannot be recycled by GC.
    memoizable = all(fn is not None for fn in loss_fns)
    run = None
    if memoizable:
        run_key = (
            tuple(id(loss) for loss in losses), weights, bool(correction),
            int(n_resample), threshold, float(threshold_quantile), stochastic,
            float(clamp_value), use_cfg, loss_images,
            id(image_augment) if image_augment is not None else None,
            plan,  # trace-time attention routing differs per plan
        )
        runs = model.__dict__.setdefault("_guided_runs", {})
        entry = runs.get(run_key)
        if entry is not None and all(
            a is b for a, b in zip(entry[1], losses)
        ):
            run = entry[0]
    if run is None:
        run = _build_guided_run(
            model, losses, loss_fns, weights, correction, n_resample,
            threshold, threshold_quantile, stochastic, clamp_value, use_cfg,
            loss_images, image_augment,
        )
        if memoizable:
            # The strong loss refs keep the keyed id()s stable, but they
            # also pin the loss towers' weights — bound the memo (FIFO) so
            # a config sweep can't accumulate unbounded pinned params.
            # image_augment is kept alive alongside so its keyed id() can't
            # be recycled either.
            while len(runs) >= _GUIDED_MEMO_MAX:
                runs.pop(next(iter(runs)))
            runs[run_key] = (run, tuple(losses), image_augment)
    from contextlib import nullcontext

    from perceptor_tpu.parallel.plan import context_parallel

    with (context_parallel(plan) if plan is not None else nullcontext()):
        return run(
            mparams, latents, pairs, loss_frozen,
            (conditioning, uncond_conditioning) if use_cfg else conditioning,
            key, jnp.float32(guidance_scale), jnp.float32(eta),
            jnp.float32(cfg_scale),
        )


def export_guided_sample(
    model,
    losses: Sequence[Callable],
    example_latents,
    example_pairs,
    conditioning=None,
    loss_weights: Optional[Sequence[float]] = None,
    eta: float = 0.0,
    correction: bool = False,
    n_resample: int = 0,
    threshold: Optional[str] = None,
    threshold_quantile: float = 0.95,
    clamp_value: float = 1e-6,
    uncond_conditioning=None,
    loss_images: str = "decoded",
    image_augment=None,
    platforms=None,
) -> bytes:
    """Serialize the guided-sampling program (the library's core IP) as a
    portable ``jax.export`` StableHLO artifact (utils/serving.py,
    docs/SERVING.md).

    The artifact's signature is ``(model_params, latents, pairs,
    loss_params, conditioning, key, guidance_scale, eta) -> (latents,
    loss_history)`` — the schedule, prompt banks, and every weight tree
    stay ARGUMENTS, so one artifact serves any checkpoint/prompt at the
    exported shapes. With ``uncond_conditioning`` the conditioning slot
    becomes the ``(cond, uncond)`` tuple and a 9th traced ``cfg_scale``
    argument is appended (classifier-free guidance composed with the loss
    guidance). Static options (correction/threshold/n_resample/
    stochastic eta) are baked; export one artifact per combination.
    ``example_latents``/``example_pairs``/``conditioning`` fix the shapes.
    Loss params for the call side come from each loss's ``loss_params``
    property (losses must follow the pure ``(apply, loss_params)``
    protocol — all shipped losses do)."""
    weights = tuple(loss_weights) if loss_weights is not None else (1.0,) * len(losses)
    _, _, loss_fns, loss_frozen = _gather_frozen(lambda p: p, losses)
    if any(fn is None for fn in loss_fns):
        raise ValueError(
            "export requires losses with the (apply, loss_params) protocol "
            "(plain callables would bake their state into the artifact)"
        )
    if threshold not in (None, "dynamic", "static"):
        raise ValueError(f"threshold must be None|'dynamic'|'static', got {threshold!r}")
    stochastic = float(eta) > 0.0
    use_cfg = uncond_conditioning is not None
    run = _build_guided_run(
        model, losses, loss_fns, weights, correction, n_resample,
        threshold, threshold_quantile, stochastic, clamp_value, use_cfg,
        loss_images, image_augment,
    )
    from perceptor_tpu.utils import serving

    example = (
        model.params, example_latents, jnp.asarray(example_pairs),
        loss_frozen,
        (conditioning, uncond_conditioning) if use_cfg else conditioning,
        jax.random.PRNGKey(0), jnp.float32(0.5), jnp.float32(eta),
    )
    if use_cfg:
        # CFG artifacts take a 9th argument (the traced cfg_scale); the
        # plain artifact keeps the original 8-argument signature
        example = example + (jnp.float32(7.0),)
    return serving.serialize_program(run, *example, platforms=platforms)


def _build_guided_run(
    model, losses, loss_fns, weights, correction, n_resample, threshold,
    threshold_quantile, stochastic, clamp_value, use_cfg=False,
    loss_images="decoded", image_augment=None,
):
    """Compile-once jitted scan for guided_sample's static configuration.

    When ``use_cfg`` the ``cond`` argument is a ``(cond, uncond)`` tuple
    and predictions are classifier-free-guidance combined before the loss
    VJP (so the loss gradient flows through BOTH model evaluations)."""

    def make_predictions(latents, from_idx, mparams, cond, cfg_scale):
        if use_cfg:
            positive, uncond = cond
            pred_u = model.predictions_fn(mparams, latents, from_idx, uncond)
            pred_c = model.predictions_fn(mparams, latents, from_idx, positive)
            return pred_u.classifier_free_guidance(pred_c, cfg_scale)
        return model.predictions_fn(mparams, latents, from_idx, cond)

    def total_loss(latents, from_idx, mparams, loss_p, cond, cfg_scale, aug_key):
        predictions = make_predictions(latents, from_idx, mparams, cond, cfg_scale)
        if loss_images == "preview":
            images = model.preview_images_fn(predictions.denoised_xs)
        else:
            images = predictions.denoised_images
        if image_augment is not None:
            images = image_augment(aug_key, images)
        values = []
        for loss, apply_fn, lp in zip(losses, loss_fns, loss_p):
            values.append(
                apply_fn(lp, images) if apply_fn is not None else loss(images)
            )
        total = jnp.sum(jnp.stack(values) * jnp.asarray(weights))
        return total, predictions

    def apply_threshold(predictions):
        if threshold == "dynamic":
            return predictions.dynamic_threshold(threshold_quantile)
        if threshold == "static":
            return predictions.static_threshold()
        return predictions

    @jax.jit
    def run(
        mparams, latents, pairs, loss_p, cond, key, guidance_scale, eta,
        cfg_scale=jnp.float32(7.0),
    ):
        def guided_predictions(latents, from_idx, aug_key):
            (value, predictions), grads = jax.value_and_grad(
                total_loss, has_aux=True
            )(latents, from_idx, mparams, loss_p, cond, cfg_scale, aug_key)
            return apply_threshold(
                predictions.guided(grads, guidance_scale, clamp_value=clamp_value)
            ), value

        def split_aug(key):
            # only consume RNG when augmenting: keeps the key stream (and
            # therefore existing trajectories) identical without a hook
            if image_augment is None:
                return key, key
            return jax.random.split(key)

        def body(carry, pair):
            latents, key = carry
            from_idx, to_idx = pair[0][None], pair[1][None]
            # RePaint churn with guidance each iteration (the reference's
            # guided_resample_ pattern, losses/velocity_diffusion.py:33-61)
            for _ in range(n_resample):
                key, resample_key = jax.random.split(key)
                key, aug_key = split_aug(key)
                guided, _ = guided_predictions(latents, from_idx, aug_key)
                latents = guided.resample(to_idx, key=resample_key)
            key, aug_key = split_aug(key)
            guided, value = guided_predictions(latents, from_idx, aug_key)
            if stochastic:
                key, step_key = jax.random.split(key)
                stepped = guided.step(to_idx, eta=eta, key=step_key)
            else:
                stepped = guided.step(to_idx)
            if correction:
                # second-order: re-evaluate at the stepped point (forward
                # only), average denoised estimates, re-step
                predictions2 = make_predictions(
                    stepped, to_idx, mparams, cond, cfg_scale
                )
                corrected = apply_threshold(predictions2.correction(guided))
                if stochastic:
                    key, step_key = jax.random.split(key)
                    stepped = corrected.step(to_idx, eta=eta, key=step_key)
                else:
                    stepped = corrected.step(to_idx)
            return (stepped, key), value

        (latents, _), history = jax.lax.scan(body, (latents, key), pairs)
        return latents, history

    return run


def run_on_device(
    synthesize,
    losses: Sequence[Callable],
    params,
    n_steps: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss_weights: Optional[Sequence[float]] = None,
):
    """Whole optimization as ONE compiled program (lax.scan over steps).

    No host round-trips: returns (final_params, per-step total loss array).
    Frozen model weights (drawer + loss towers) are threaded as arguments,
    never baked as constants (see _gather_frozen).
    """
    optimizer = optimizer or optax.adam(0.05)
    weights = list(loss_weights) if loss_weights is not None else [1.0] * len(losses)
    synth_fn, synth_frozen, loss_fns, loss_frozen = _gather_frozen(
        synthesize, losses
    )
    # Memoize the compiled loop per (drawer, losses, weights, steps,
    # optimizer) — a fresh @jax.jit closure per call would re-trace the
    # WHOLE n_steps scan on every invocation (seconds of host time that
    # also poisons throughput measurements; caught by bench.py --family
    # raw). Pure-protocol losses only (same rule as guided_sample); the
    # memo holds strong refs so keyed id()s can't be recycled. NOTE:
    # construct the optimizer ONCE and reuse it across calls — a fresh
    # optax.adam(...) is a new key.
    memoizable = all(fn is not None for fn in loss_fns)
    memo_key = (
        id(synthesize), tuple(id(l) for l in losses), tuple(weights),
        int(n_steps), id(optimizer),
    )
    if memoizable:
        entry = _RUN_ON_DEVICE_MEMO.get(memo_key)
        if entry is not None and entry[1][0] is synthesize and all(
            a is b for a, b in zip(entry[1][1], losses)
        ) and entry[1][2] is optimizer:
            return entry[0](params, (synth_frozen, loss_frozen))
    synth_plain = (
        synthesize.synthesize if hasattr(synthesize, "synthesize") else synthesize
    )
    # drawer-level param penalty (see make_guidance_step)
    penalty_fn = getattr(synthesize, "loss", None)

    def total_loss(p, frozen):
        synth_p, loss_p = frozen
        if synth_fn is not None:
            images = synth_fn(synth_p, p)
        else:
            images = synth_plain(p)
        values = []
        for loss, apply_fn, lp in zip(losses, loss_fns, loss_p):
            values.append(
                apply_fn(lp, images) if apply_fn is not None else loss(images)
            )
        total = jnp.sum(jnp.stack(values) * jnp.asarray(weights))
        if penalty_fn is not None:
            total = total + penalty_fn(p)
        return total

    @jax.jit
    def run(params, frozen):
        opt_state = optimizer.init(params)

        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(total_loss)(params, frozen)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses_history = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, losses_history

    if memoizable:
        while len(_RUN_ON_DEVICE_MEMO) >= _GUIDED_MEMO_MAX:
            _RUN_ON_DEVICE_MEMO.pop(next(iter(_RUN_ON_DEVICE_MEMO)))
        _RUN_ON_DEVICE_MEMO[memo_key] = (
            run, (synthesize, tuple(losses), optimizer)
        )
    return run(params, (synth_frozen, loss_frozen))
