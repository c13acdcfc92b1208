"""MonsterDiffusion wrapper (EDM, 48x48 sprites, "all"/"tiny-hero").

Rebuild of reference perceptor/models/monster_diffusion/monster_diffusion.py:20-320:
EDM preconditioning c_skip/c_out/c_in/c_noise (:85-101), sigma-space
schedule (:44-52), stochastic churn `elucidated_sample` (:212-268),
`linear_multistep_sample` with host-side scipy LMS coefficients (:273-320).
Samplers are fully-compiled lax.scan programs; generator variants keep the
reference ergonomics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.monster_diffusion import net as monster_net
from perceptor_tpu.predictions import EDMPredictions, diffusion_space
from perceptor_tpu.schedules import EDM as EDMConstants
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

INPUT_SHAPE = (3, 48, 48)
N_AUGMENTATIONS = 9


@utils.cache
class MonsterDiffusion:
    def __init__(self, name: str = "all", fp16: bool = True):
        if name not in monster_net.MODEL_CONFIGS:
            raise ValueError(f"Unknown model name {name}")
        self.name = name
        self.config = monster_net.MODEL_CONFIGS[name]
        self.constants = EDMConstants()
        self.module = monster_net.MonsterUNet(
            self.config, dtype=jnp.bfloat16 if fp16 else jnp.float32
        )
        self.params = self._load_or_init_params()
        self._jit_denoised = jax.jit(self.denoised_fn)

    @property
    def shape(self):
        return INPUT_SHAPE if self.name != "tiny" else (3, 16, 16)

    def _load_or_init_params(self):
        path = find_checkpoint(f"monster_diffusion_{self.name}", self.name)
        if path is not None:
            from perceptor_tpu.models.monster_diffusion import convert
            from perceptor_tpu.utils.checkpoints import native_params

            sd = load_state_dict(path)
            native = native_params(sd)
            params = (
                native if native is not None
                else convert.from_torch(sd, self.config)
            )
            return jax.device_put(params, jax.devices()[0])
        return init_by_shape(
            self.module.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, *self.shape)),
            jnp.zeros((1,)),
            jnp.zeros((1, N_AUGMENTATIONS)),
        )["params"]

    # -- schedule -------------------------------------------------------------

    def _schedule_ts(self, n_steps: int) -> np.ndarray:
        c = self.constants
        ramp = np.linspace(0, 1, n_steps)
        min_inv_rho = c.sigma_min ** (1 / c.rho)
        max_inv_rho = c.sigma_max ** (1 / c.rho)
        return ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** c.rho).astype(
            np.float32
        )

    def schedule_ts(self, n_steps: int):
        """(from, to) sigma pairs (reference :50-52)."""
        ts = self._schedule_ts(n_steps)
        return np.stack([ts[:-1], ts[1:]], axis=1)

    def training_ts(self, size: int, key) -> jax.Array:
        c = self.constants
        return jnp.exp(c.P_mean + jax.random.normal(key, (size,)) * c.P_std)

    @staticmethod
    def sigmas(ts):
        return jnp.atleast_1d(jnp.asarray(ts))[:, None, None, None]

    @staticmethod
    def alphas(ts):
        return jnp.ones_like(MonsterDiffusion.sigmas(ts))

    def random_noise(self, size: int, key) -> jax.Array:
        return diffusion_space.decode(
            jax.random.normal(key, (size, *self.shape)) * self.constants.sigma_max
        )

    def diffuse(self, images, ts, noise=None, key=None) -> jax.Array:
        x0 = diffusion_space.encode(images)
        if noise is None:
            if key is None:
                raise ValueError("diffuse is stochastic: pass noise= or key=")
            noise = jax.random.normal(key, x0.shape, x0.dtype)
        return diffusion_space.decode(x0 + noise * self.sigmas(ts))

    # -- EDM preconditioning (reference :85-101) ----------------------------------

    def denoised_fn(self, params, diffused_images, ts, nonleaky_augmentations=None):
        c = self.constants
        sigmas = self.sigmas(ts)
        xs = diffusion_space.encode(diffused_images)
        c_skip = c.sigma_data**2 / (c.sigma_data**2 + sigmas**2)
        c_out = sigmas * c.sigma_data / jnp.sqrt(c.sigma_data**2 + sigmas**2)
        c_in = 1.0 / jnp.sqrt(c.sigma_data**2 + sigmas**2)
        c_noise = 0.25 * jnp.log(sigmas.reshape(-1))
        if nonleaky_augmentations is None:
            nonleaky_augmentations = jnp.zeros(
                (diffused_images.shape[0], N_AUGMENTATIONS)
            )
        output = self.module.apply(
            {"params": params}, c_in * xs, c_noise, nonleaky_augmentations
        )
        return c_skip * xs + c_out * output

    def denoised_(self, diffused_images, ts, nonleaky_augmentations=None):
        ts = jnp.atleast_1d(jnp.asarray(ts, jnp.float32))
        if ts.shape[0] == 1 and diffused_images.shape[0] > 1:
            ts = jnp.broadcast_to(ts, (diffused_images.shape[0],))
        if nonleaky_augmentations is None:
            return self._jit_denoised(self.params, diffused_images, ts)
        return self._jit_denoised(
            self.params, diffused_images, ts, nonleaky_augmentations
        )

    def predictions(
        self, diffused_images, ts, nonleaky_augmentations=None
    ) -> EDMPredictions:
        ts = jnp.atleast_1d(jnp.asarray(ts, jnp.float32))
        if ts.shape[0] == 1 and diffused_images.shape[0] > 1:
            ts = jnp.broadcast_to(ts, (diffused_images.shape[0],))
        return EDMPredictions(
            denoised_xs=self.denoised_(diffused_images, ts, nonleaky_augmentations),
            diffused_images=diffused_images,
            ts=ts,
        )

    forward = predictions
    predictions_ = predictions

    # -- churn (reference :173-199) ------------------------------------------------

    def gamma(self, ts, n_steps):
        c = self.constants
        ts = jnp.asarray(ts)
        return jnp.where(
            (ts >= c.S_tmin) & (ts <= c.S_tmax),
            jnp.minimum(c.S_churn / n_steps, np.sqrt(2) - 1),
            jnp.zeros_like(ts),
        )

    def reversed_ts(self, ts, n_steps):
        return ts + self.gamma(ts, n_steps) * ts

    def inject_noise(self, diffused_images, ts, reversed_ts, key):
        xs = diffusion_space.encode(diffused_images)
        fresh = jax.random.normal(key, xs.shape, xs.dtype)
        added = jnp.sqrt(
            jnp.square(self.sigmas(reversed_ts)) - jnp.square(self.sigmas(ts))
        )
        return diffusion_space.decode(
            xs + added * fresh * self.constants.S_noise
        )

    # -- samplers -----------------------------------------------------------------------

    def sample(self, size, n_evaluations=100, key=None, diffused_images=None):
        """Elucidated stochastic sampler as ONE compiled lax.scan program
        (reference generator :212-268)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        n_steps = n_evaluations // 2
        init_key, scan_key = jax.random.split(key)
        if diffused_images is None:
            diffused_images = self.random_noise(size, init_key)
        pairs = jnp.asarray(self.schedule_ts(n_steps))
        augmentations = jnp.zeros((size, N_AUGMENTATIONS), jnp.float32)
        c_max = self.constants.sigma_max

        # memoize the jitted scan per (size, n_steps): rebuilding the closure
        # per call would re-trace every sample()
        if not hasattr(self, "_sample_runs"):
            self._sample_runs = {}
        run = self._sample_runs.get((size, n_steps))
        if run is not None:
            return run(self.params, diffused_images, scan_key)

        def make_predictions(params, images, ts):
            return EDMPredictions(
                denoised_xs=self.denoised_fn(params, images, ts, augmentations),
                diffused_images=images,
                ts=ts,
            )

        @jax.jit
        def run(params, diffused_images, key):
            def body(carry, pair):
                images, key = carry
                key, noise_key = jax.random.split(key)
                from_ts = jnp.broadcast_to(pair[0], (size,))
                to_ts = jnp.broadcast_to(pair[1], (size,))
                reversed_ts = jnp.clip(
                    self.reversed_ts(from_ts, n_steps), max=c_max
                )
                reversed_images = self.inject_noise(
                    images, from_ts, reversed_ts, noise_key
                )
                predictions = make_predictions(params, reversed_images, reversed_ts)
                reversed_eps = predictions.eps
                images = predictions.step(to_ts)
                predictions = make_predictions(params, images, to_ts)
                images = predictions.heun_correction(
                    reversed_images, reversed_ts, reversed_eps
                )
                return (images, key), None

            (images, key), _ = jax.lax.scan(body, (diffused_images, key), pairs)
            # final churned denoise (reference :258-268)
            to_ts = jnp.broadcast_to(pairs[-1, 1], (size,))
            reversed_ts = self.reversed_ts(to_ts, n_steps)
            images = self.inject_noise(images, to_ts, reversed_ts, key)
            predictions = make_predictions(params, images, reversed_ts)
            return jnp.clip(predictions.denoised_images, 0, 1)

        self._sample_runs[(size, n_steps)] = run
        return run(self.params, diffused_images, scan_key)

    elucidated_sample = sample

    def dpm_solver_sample(
        self, size, n_evaluations=100, key=None, diffused_images=None
    ):
        """DPM-Solver++(2M) deterministic sampler as ONE compiled lax.scan
        (beyond-reference; predictions/dpm_solver.py).  One model eval per
        step over the same Karras sigma grid, so ``n_evaluations`` buys
        ``n_evaluations`` steps — vs 2 evals/step for the elucidated Heun
        sampler (reference :212-268)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if diffused_images is None:
            diffused_images = self.random_noise(size, key)
        n_steps = n_evaluations
        pairs = jnp.asarray(self.schedule_ts(n_steps))
        augmentations = jnp.zeros((size, N_AUGMENTATIONS), jnp.float32)

        runs = self.__dict__.setdefault("_dpm_sample_runs", {})
        run = runs.get((size, n_steps))
        if run is None:

            def make_predictions(params, images, ts):
                return EDMPredictions(
                    denoised_xs=self.denoised_fn(
                        params, images, ts, augmentations
                    ),
                    diffused_images=images,
                    ts=ts,
                )

            @jax.jit
            def run(params, diffused_images):
                def body(carry, step_input):
                    i, pair = step_input
                    images, prev_x0, prev_h = carry
                    from_ts = jnp.broadcast_to(pair[0], (size,))
                    to_ts = jnp.broadcast_to(pair[1], (size,))
                    predictions = make_predictions(params, images, from_ts)
                    images, prev_h = predictions.dpm_solver_pp_step(
                        to_ts, prev_x0, prev_h, i == 0
                    )
                    return (images, predictions.denoised_xs, prev_h), None

                steps = (jnp.arange(pairs.shape[0]), pairs)
                carry0 = (
                    diffused_images,
                    jnp.zeros((size, *self.shape), diffused_images.dtype),
                    jnp.ones((size, 1, 1, 1), diffused_images.dtype),
                )
                (images, *_), _ = jax.lax.scan(body, carry0, steps)
                final_ts = jnp.broadcast_to(pairs[-1, 1], (size,))
                return jnp.clip(
                    make_predictions(params, images, final_ts).denoised_images,
                    0,
                    1,
                )

            runs[(size, n_steps)] = run
        return run(self.params, diffused_images)

    @staticmethod
    def linear_multistep_coeff(order, sigmas, from_index, to_index):
        """Reference :273-290 (host-side scipy quadrature)."""
        from scipy import integrate

        if order - 1 > from_index:
            raise ValueError(f"Order {order} too high for step {from_index}")

        def fn(tau):
            prod = 1.0
            for k in range(order):
                if to_index == k:
                    continue
                prod *= (tau - sigmas[from_index - k]) / (
                    sigmas[from_index - to_index] - sigmas[from_index - k]
                )
            return prod

        return integrate.quad(
            fn, sigmas[from_index], sigmas[from_index + 1], epsrel=1e-4
        )[0]

    def linear_multistep_sample(
        self, size, n_evaluations=100, key=None, diffused_images=None, order=4
    ):
        """LMS sampler (reference :292-320). Coefficients are precomputed on
        the host (static), the eps history loop runs compiled per step."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if diffused_images is None:
            diffused_images = self.random_noise(size, key)
        n_steps = n_evaluations
        sigmas = self._schedule_ts(n_steps)
        augmentations = jnp.zeros((size, N_AUGMENTATIONS), jnp.float32)

        epses = []
        images = diffused_images
        for from_index in range(n_steps - 1):
            from_ts = jnp.full((size,), sigmas[from_index])
            predictions = self.predictions(images, from_ts, augmentations)
            epses.append(predictions.eps)
            current_order = min(from_index + 1, order)
            coeffs = [
                self.linear_multistep_coeff(
                    current_order, sigmas, from_index, k
                )
                for k in range(current_order)
            ]
            delta = sum(
                coeff * eps
                for coeff, eps in zip(coeffs, reversed(epses[-current_order:]))
            )
            images = diffusion_space.decode(
                diffusion_space.encode(images) + delta
            )
        return jnp.clip(
            self.predictions(
                images, jnp.full((size,), sigmas[-1]), augmentations
            ).denoised_images,
            0,
            1,
        )
