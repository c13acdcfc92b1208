"""VelocityDiffusion wrapper (yfcc_2 / yfcc_1 / cc12m_1_cfg / wikiart).

Rebuild of reference perceptor/models/velocity_diffusion/velocity_diffusion.py:15-164:
continuous-t cosine schedule, Karras-rho `schedule_ts`, `velocities()` UNet
forward (bf16, the autocast analogue of :96-109), `predictions()` ->
VelocityPredictions, CLIP `conditioning()` for cc12m (:123-135),
`diffuse` (:137-144), and `inject_noise` reverse-renoising (:146-164,
explicit key).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.velocity_diffusion import configs
from perceptor_tpu.models.velocity_diffusion.net import VDiffusionUNet
from perceptor_tpu.predictions import VelocityPredictions, diffusion_space
from perceptor_tpu.schedules import t_to_alpha_sigma, sigma_to_t, velocity_schedule_ts
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@utils.cache
class VelocityDiffusion:
    def __init__(self, name: str = "yfcc_2", fp16: bool = True, remat: bool = False):
        """Args mirror reference velocity_diffusion.py:16-23; available
        names: yfcc_2, yfcc_1, cc12m_1_cfg (CLIP-conditioned), wikiart."""
        if name not in configs.MODEL_CONFIGS:
            raise ValueError(f"unknown velocity diffusion model: {name}")
        self.name = name
        cfg = configs.MODEL_CONFIGS[name]
        if remat:
            import dataclasses

            cfg = dataclasses.replace(cfg, remat=True)
        self.config = cfg
        self.module = VDiffusionUNet(cfg, dtype=jnp.bfloat16 if fp16 else jnp.float32)
        self.params = self._load_or_init_params()
        self._jit_velocities = jax.jit(self._velocities_fn)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.config.in_channels, *self.config.image_size)

    @property
    def conditioned(self) -> bool:
        return self.config.mapping is not None

    def _load_or_init_params(self):
        path = find_checkpoint(f"velocity_diffusion_{self.name}", self.name)
        if path is not None:
            from perceptor_tpu.models.velocity_diffusion import convert
            from perceptor_tpu.utils.checkpoints import native_params

            sd = load_state_dict(path)
            native = native_params(sd)
            params = (
                native if native is not None
                else convert.from_torch(sd, self.config)
            )
            return jax.device_put(params, jax.devices()[0])
        # cheap init size, but never below what the level count can pool:
        # n levels halve the map n-1 times, so the innermost level needs
        # size / 2^(n-1) >= 1 (yfcc's 8 levels at the old 64px floor hit a
        # zero-sized map — caught by bench.py --family velocity)
        min_size = 2 ** (len(self.config.channels) - 1)
        size = min(self.config.image_size[0], max(64, min_size))
        kwargs = {}
        if self.conditioned:
            kwargs["clip_embed"] = jnp.zeros((1, self.config.mapping.clip_dim))
        return init_by_shape(
            self.module.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.config.in_channels, size, size)),
            jnp.zeros((1,)),
            **kwargs,
        )["params"]

    # -- schedules (host-side, static) ---------------------------------------

    @staticmethod
    def schedule_ts(n_steps=500, from_ts=1.0, to_ts=1e-2, rho=7.0) -> np.ndarray:
        """(n_steps, 2) (from_t, to_t) pairs (reference :47-66)."""
        return velocity_schedule_ts(n_steps, from_ts, to_ts, rho)

    @staticmethod
    def sigmas_to_ts(sigmas):
        return sigma_to_t(sigmas)

    def alphas(self, ts):
        alphas, _ = t_to_alpha_sigma(jnp.atleast_1d(jnp.asarray(ts)))
        return alphas[:, None, None, None]

    def sigmas(self, ts):
        _, sigmas = t_to_alpha_sigma(jnp.atleast_1d(jnp.asarray(ts)))
        return sigmas[:, None, None, None]

    def random_diffused(self, shape, key) -> jax.Array:
        """Pure-noise start (reference :68-69, explicit key)."""
        return diffusion_space.decode(jax.random.normal(key, shape))

    # -- network -------------------------------------------------------------

    def _velocities_fn(self, params, diffused_images, ts, conditioning=None):
        xs = diffusion_space.encode(diffused_images)
        if conditioning is not None:
            clip_embed = jnp.asarray(conditioning)
            if clip_embed.ndim == 3:  # (1, N, D) stacked conditioning
                clip_embed = clip_embed.squeeze(0)
            return self.module.apply({"params": params}, xs, ts, clip_embed)
        return self.module.apply({"params": params}, xs, ts)

    def velocities(self, diffused_images, ts, conditioning=None) -> jax.Array:
        """UNet forward (reference :96-109)."""
        ts = jnp.asarray(ts, dtype=jnp.float32)
        if ts.ndim == 0:
            ts = jnp.broadcast_to(ts, (diffused_images.shape[0],))
        if conditioning is None:
            return self._jit_velocities(self.params, diffused_images, ts)
        return self._jit_velocities(self.params, diffused_images, ts, conditioning)

    def predictions(self, diffused_images, ts, conditioning=None) -> VelocityPredictions:
        """(reference :111-121)."""
        ts = jnp.asarray(ts, dtype=jnp.float32)
        if ts.ndim == 0:
            ts = jnp.broadcast_to(ts, (diffused_images.shape[0],))
        return VelocityPredictions(
            from_diffused_images=diffused_images,
            from_ts=ts,
            velocities=self.velocities(diffused_images, ts, conditioning),
        )

    forward = predictions

    def predictions_fn(
        self, params, diffused_images, ts, conditioning=None
    ) -> VelocityPredictions:
        """Pure `predictions` (params as an argument, jit/engine-safe)."""
        ts = jnp.asarray(ts, dtype=jnp.float32)
        if ts.ndim == 0:
            ts = jnp.broadcast_to(ts, (diffused_images.shape[0],))
        return VelocityPredictions(
            from_diffused_images=diffused_images,
            from_ts=ts,
            velocities=self._velocities_fn(
                params, diffused_images, ts, conditioning
            ),
        )

    def conditioning(self, texts=None, images=None, encodings=None) -> jax.Array:
        """Mean of CLIP text/image/raw encodings (reference :123-135)."""
        from perceptor_tpu import models

        clip_model = models.CLIP(self.config.mapping.clip_model)
        all_encodings = []
        if texts is not None:
            all_encodings.append(clip_model.encode_texts(texts))
        if images is not None:
            all_encodings.append(clip_model.encode_images(images))
        if encodings is not None:
            all_encodings.append(jnp.asarray(encodings))
        if not all_encodings:
            raise ValueError("Must provide at least one of texts, images, encodings")
        return jnp.stack(all_encodings, axis=0).mean(axis=0)[None]

    # -- diffusion utilities ------------------------------------------------------

    def diffuse(self, denoised_images, ts, noise=None, key=None) -> jax.Array:
        """q-sample (reference :137-144)."""
        xs = diffusion_space.encode(denoised_images)
        ts = jnp.atleast_1d(jnp.asarray(ts, dtype=jnp.float32))
        if noise is None:
            if key is None:
                raise ValueError("diffuse() is stochastic: pass noise= or key=")
            noise = jax.random.normal(key, xs.shape, xs.dtype)
        return diffusion_space.decode(
            xs * self.alphas(ts) + noise * self.sigmas(ts)
        )

    def inject_noise(
        self, diffused_images, ts, reversed_ts, key, extra_noise_multiplier=1.003
    ) -> jax.Array:
        """Reverse-renoise to a higher t (reference :146-164)."""
        xs = diffusion_space.encode(diffused_images)
        multiplier = self.alphas(reversed_ts) / self.alphas(ts)
        target_sigmas = self.sigmas(reversed_ts)
        additional_std = jnp.sqrt(
            jnp.square(target_sigmas)
            - jnp.square(self.sigmas(ts)) * jnp.square(multiplier)
        )
        fresh = jax.random.normal(key, xs.shape, xs.dtype)
        return diffusion_space.decode(
            xs * multiplier + additional_std * fresh * extra_noise_multiplier
        )

    # -- fused sampler ---------------------------------------------------------

    def sample(
        self,
        n_images: int = 1,
        n_steps: int = 50,
        conditioning=None,
        eta: float = 0.0,
        churn: float = 0.0,
        correction: bool = False,
        key=None,
        from_ts: float = 1.0,
        to_ts: float = 1e-2,
        mesh=None,
        rules=None,
        method: str = "ddim",
    ) -> jax.Array:
        """The reference's canonical sampling loop as ONE lax.scan program.

        The reference ships no sampler entry point for this family (its
        sampling.py is dead code); the spec is its own test loop
        (reference velocity_diffusion.py:167-198): per schedule pair,
        optional stochastic reverse-renoise churn (``churn=0.003``
        reproduces the loop's ``from_ts * 1.003``), a DDIM step
        (stochastic for ``eta>0``), and optional PNDM-ish ``correction``
        (re-evaluate at the stepped point, average the denoised
        estimates, re-step — reference :184-194). Compiled programs are
        memoized per static flag combination; ``eta``/``churn`` are
        traced, so sweeping them reuses one executable. Returns the final
        denoised images in [0, 1], shape ``(n_images, *self.shape)``.

        ``method`` selects the sampler: ``"ddim"`` (default, all options
        above), the deterministic PNDM pair ``"plms"`` / ``"prk"``
        (reference sampling.py:137-172 via models/velocity_diffusion/
        pndm.py), or ``"dpm++"`` (DPM-Solver++(2M),
        predictions/dpm_solver.py — beyond-reference; ~20 steps for
        50-step-DDIM quality). eta/churn/correction apply to ddim only.
        """
        if method not in ("ddim", "plms", "prk", "dpm++"):
            raise ValueError(f"unknown sampling method: {method!r}")
        key = key if key is not None else jax.random.PRNGKey(0)
        init_key, scan_key = jax.random.split(key)
        diffused = self.random_diffused((n_images, *self.shape), init_key)
        pairs = jnp.asarray(
            self.schedule_ts(n_steps, from_ts=from_ts, to_ts=to_ts),
            jnp.float32,
        )
        if self.conditioned:
            if conditioning is None:
                # zero CLIP embedding == the CFG-trained unconditional branch
                conditioning = jnp.zeros(
                    (n_images, self.config.mapping.clip_dim)
                )
            else:
                conditioning = jnp.asarray(conditioning)
                if conditioning.ndim == 3:  # (1, N, D) stacked conditioning
                    conditioning = conditioning.squeeze(0)
                if conditioning.shape[0] == 1 and n_images > 1:
                    # one embedding guides the whole batch (the UNet mapping
                    # concatenates per-sample, so batch dims must match)
                    conditioning = jnp.broadcast_to(
                        conditioning, (n_images, conditioning.shape[1])
                    )

        params = self.params
        if mesh is not None:
            from perceptor_tpu import parallel

            params, diffused, pairs, conditioning, scan_key = (
                parallel.shard_for_sampling(
                    mesh, params, diffused, pairs, conditioning, scan_key,
                    rules=rules,
                )
            )

        from perceptor_tpu.parallel.plan import activate, plan_for_mesh

        plan = plan_for_mesh(mesh) if mesh is not None else None
        runs = self.__dict__.setdefault("_sample_runs", {})
        if method != "ddim":
            if eta or churn or correction:
                raise ValueError(
                    f"{method} is deterministic: eta/churn/correction do not apply"
                )
            run_key = (method, conditioning is not None, plan)
            run = runs.get(run_key)
            if run is None:
                build = (
                    self._build_dpm_run
                    if method == "dpm++"
                    else lambda: self._build_pndm_run(method)
                )
                run = build()
                runs[run_key] = run
            with activate(plan):
                return run(params, diffused, pairs, conditioning)

        stochastic = float(eta) > 0.0
        do_churn = float(churn) > 0.0
        run_key = (
            stochastic, do_churn, bool(correction), conditioning is not None,
            plan,
        )
        run = runs.get(run_key)
        if run is None:
            run = self._build_sample_run(stochastic, do_churn, bool(correction))
            runs[run_key] = run
        with activate(plan):  # trace-time ring/Ulysses attention routing
            return run(
                params, diffused, pairs, conditioning, scan_key,
                jnp.float32(eta), jnp.float32(churn),
            )

    def export_sample(
        self,
        n_images: int = 1,
        n_steps: int = 50,
        eta: float = 0.0,
        churn: float = 0.0,
        correction: bool = False,
        platforms=None,
    ) -> bytes:
        """Serialize the fused sampler as a portable ``jax.export``
        artifact (utils/serving.py, docs/SERVING.md). Artifact signature:
        ``(params, diffused, pairs, conditioning, key, eta, churn) ->
        images`` — schedule and weights stay arguments; static flags
        (churn/correction/stochastic) are baked per artifact.
        ``conditioning`` is the (n_images, clip_dim) CLIP embedding for
        conditioned checkpoints, absent (None) otherwise."""
        stochastic = float(eta) > 0.0
        do_churn = float(churn) > 0.0
        run = self._build_sample_run(stochastic, do_churn, bool(correction))
        cond = (
            jnp.zeros((n_images, self.config.mapping.clip_dim))
            if self.conditioned
            else None
        )
        from perceptor_tpu.utils import serving

        example = (
            self.params,
            jnp.zeros((n_images, *self.shape)),
            jnp.asarray(self.schedule_ts(n_steps), jnp.float32),
            cond,
            jax.random.PRNGKey(0),
            jnp.float32(eta),
            jnp.float32(churn),
        )
        return serving.serialize_program(run, *example, platforms=platforms)

    def _eps_fn(self, params, cond):
        """Noise-prediction closure over xs in diffusion space
        (reference sampling.py:90-95: eps = x·σ + v·α)."""
        from perceptor_tpu.models.velocity_diffusion import pndm

        def eps_fn(xs, ts):
            v = self._velocities_fn(
                params, diffusion_space.decode(xs), ts, cond
            )
            alphas, sigmas = t_to_alpha_sigma(ts)
            return (
                xs * pndm._broadcast(sigmas, xs)
                + v * pndm._broadcast(alphas, xs)
            )

        return eps_fn

    def _build_pndm_run(self, method: str):
        """Jitted PLMS/PRK sampler (pndm.py; reference sampling.py:137-172)."""
        from perceptor_tpu.models.velocity_diffusion import pndm

        sampler = pndm.plms_sample if method == "plms" else pndm.prk_sample

        @jax.jit
        def run(params, diffused, pairs, cond):
            # 1D descending time sequence with the trailing 0 the
            # reference appends (sampling.py:143/:160)
            ts = jnp.concatenate(
                [pairs[:, 0], pairs[-1:, 1], jnp.zeros((1,), jnp.float32)]
            )
            xs = diffusion_space.encode(diffused)
            _, pred = sampler(self._eps_fn(params, cond), xs, ts)
            return diffusion_space.decode(pred)

        return run

    def _build_dpm_run(self):
        """Jitted DPM-Solver++(2M) sampler (predictions/dpm_solver.py):
        one model eval per step, denoised estimate + log-SNR step size
        carried through the scan."""

        @jax.jit
        def run(params, diffused, pairs, cond):
            n = diffused.shape[0]

            def body(carry, step_input):
                diffused, prev_x0, prev_h = carry
                i, pair = step_input
                from_t = jnp.broadcast_to(pair[0], (n,))
                to_t = jnp.broadcast_to(pair[1], (n,))
                predictions = self.predictions_fn(params, diffused, from_t, cond)
                stepped, h = predictions.dpm_solver_pp_step(
                    to_t, prev_x0, prev_h, i == 0
                )
                return (stepped, predictions.denoised_xs, h), None

            carry0 = (
                diffused,
                jnp.zeros_like(diffusion_space.encode(diffused)),
                jnp.ones((n, 1, 1, 1), jnp.float32),
            )
            (diffused, *_), _ = jax.lax.scan(
                body, carry0, (jnp.arange(pairs.shape[0]), pairs)
            )
            final_t = jnp.broadcast_to(pairs[-1, 1], (n,))
            return self.predictions_fn(
                params, diffused, final_t, cond
            ).denoised_images

        return run

    def reverse_sample(
        self, images, n_steps: int = 50, conditioning=None,
        from_ts: float = 1e-2, to_ts: float = 1.0,
    ) -> jax.Array:
        """DDIM inversion: the diffused latent that eta=0 sampling decodes
        back into `images` (reference sampling.py:55-82), fused as one
        scan. Returns diffused images in [0, 1] at ``to_ts``."""
        cond = None
        if conditioning is not None:
            cond = jnp.asarray(conditioning)
            if cond.ndim == 3:
                cond = cond.squeeze(0)
        ts = jnp.asarray(
            self.schedule_ts(n_steps, from_ts=to_ts, to_ts=from_ts)[::-1],
            jnp.float32,
        )
        # ascending sequence: reversed (from, to) pairs -> (to[::-1], from[-1])
        ts = jnp.concatenate([ts[:, 1], ts[-1:, 0]])
        runs = self.__dict__.setdefault("_sample_runs", {})
        run_key = ("reverse", cond is not None)
        run = runs.get(run_key)
        if run is None:
            from perceptor_tpu.models.velocity_diffusion import pndm

            @jax.jit
            def run(params, images, ts, cond):
                xs = diffusion_space.encode(images)
                xs = pndm.ddim_reverse_sample(self._eps_fn(params, cond), xs, ts)
                return diffusion_space.decode(xs)

            runs[run_key] = run
        return run(self.params, jnp.asarray(images), ts, cond)

    def _build_sample_run(self, stochastic, do_churn, correction):
        """Jitted scan for `sample()`'s static flag combination."""

        @jax.jit
        def run(params, diffused, pairs, cond, key, eta, churn):
            n = diffused.shape[0]

            def predict(diffused, ts):
                return self.predictions_fn(params, diffused, ts, cond)

            def body(carry, pair):
                diffused, key = carry
                from_t = jnp.broadcast_to(pair[0], (n,))
                to_t = jnp.broadcast_to(pair[1], (n,))
                if do_churn:
                    # renoise toward from_t*(1+churn) where from_t < 1
                    # (the reference's `if (from_ts < 1.0).all()` guard,
                    # lowered trace-safely to a where)
                    new_from = jnp.minimum(from_t * (1.0 + churn), 1.0)
                    key, churn_key = jax.random.split(key)
                    renoised = predict(diffused, from_t).noisy_reverse_step(
                        new_from, key=churn_key
                    )
                    apply_c = (from_t < 1.0)[:, None, None, None]
                    diffused = jnp.where(apply_c, renoised, diffused)
                    from_t = jnp.where(from_t < 1.0, new_from, from_t)
                predictions = predict(diffused, from_t)
                if stochastic:
                    key, step_key = jax.random.split(key)
                    stepped = predictions.step(to_t, eta=eta, key=step_key)
                else:
                    stepped = predictions.step(to_t)
                if correction:
                    corrected = predict(stepped, to_t).correction(predictions)
                    if stochastic:
                        key, step_key = jax.random.split(key)
                        stepped = corrected.step(to_t, eta=eta, key=step_key)
                    else:
                        stepped = corrected.step(to_t)
                return (stepped, key), None

            (diffused, key), _ = jax.lax.scan(body, (diffused, key), pairs)
            final_t = jnp.broadcast_to(pairs[-1, 1], (n,))
            return predict(diffused, final_t).denoised_images

        return run
