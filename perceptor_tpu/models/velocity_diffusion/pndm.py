"""PNDM samplers (pseudo Runge-Kutta + pseudo linear multistep).

Functional spec: reference perceptor/models/velocity_diffusion/sampling.py
:86-172 (`prk_step` :113, `plms_step` :128, `prk_sample` :137,
`plms_sample` :153; the PNDM paper, openreview PlKWVd2yBkY).  The reference
keeps these as dead-code host-loop generators; here they are fused
samplers: the first three steps (PRK warm-up, 4 UNet evals each) unroll,
the remaining steps run as ONE `lax.scan` whose carry holds the
3-deep eps history — so a 50-step PLMS sample is a single XLA program
with 3·4 + 47 UNet calls and zero per-step host dispatch.

All math lives in diffusion space (x ∈ [-1, 1]); `eps_fn(xs, ts)` is the
noise-prediction model (for velocity models,
``eps = x·σ(t) + v·α(t)`` — reference sampling.py:90-95).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from perceptor_tpu.schedules import t_to_alpha_sigma

EpsFn = Callable[[jax.Array, jax.Array], jax.Array]


def _broadcast(values, x):
    return values.reshape(values.shape + (1,) * (x.ndim - values.ndim))


def transfer(x, eps, t_1, t_2):
    """Move x from t_1 to t_2 along the deterministic (eta=0) DDIM flow
    implied by the noise estimate (reference sampling.py:106-111)."""
    alphas, sigmas = t_to_alpha_sigma(t_1)
    next_alphas, next_sigmas = t_to_alpha_sigma(t_2)
    pred = (x - eps * _broadcast(sigmas, x)) / _broadcast(alphas, x)
    x = pred * _broadcast(next_alphas, x) + eps * _broadcast(next_sigmas, x)
    return x, pred


def prk_step(eps_fn: EpsFn, x, t_1, t_2):
    """One pseudo Runge-Kutta step: 4 model evals, midpoint weighting
    (reference sampling.py:113-126)."""
    t_mid = (t_2 + t_1) / 2
    eps_1 = eps_fn(x, t_1)
    x_1, _ = transfer(x, eps_1, t_1, t_mid)
    eps_2 = eps_fn(x_1, t_mid)
    x_2, _ = transfer(x, eps_2, t_1, t_mid)
    eps_3 = eps_fn(x_2, t_mid)
    x_3, _ = transfer(x, eps_3, t_1, t_2)
    eps_4 = eps_fn(x_3, t_2)
    eps_prime = (eps_1 + 2 * eps_2 + 2 * eps_3 + eps_4) / 6
    x_new, pred = transfer(x, eps_prime, t_1, t_2)
    return x_new, eps_prime, pred


def plms_step(eps_fn: EpsFn, x, old_eps, t_1, t_2):
    """One pseudo linear-multistep (Adams-Bashforth 4) step: 1 model eval
    against a 3-deep eps history (reference sampling.py:128-133).
    `old_eps` is (e[-3], e[-2], e[-1]) oldest-first."""
    eps = eps_fn(x, t_1)
    eps_prime = (
        55 * eps - 59 * old_eps[2] + 37 * old_eps[1] - 9 * old_eps[0]
    ) / 24
    x_new, pred = transfer(x, eps_prime, t_1, t_2)
    return x_new, eps, pred


def _step_pairs(ts):
    return ts[:-1], ts[1:]


def prk_sample(eps_fn: EpsFn, x, ts):
    """Fused PRK sampler. `ts` is the (n+1,) 1D time sequence (descending
    for sampling, ascending for DDIM inversion; append the trailing 0
    before calling, as the reference's samplers do at :143/:160).
    Returns (x_final, pred_final)."""
    ts = jnp.asarray(ts, jnp.float32)
    n = x.shape[0]

    def body(carry, pair):
        x, _ = carry
        t_1 = jnp.broadcast_to(pair[0], (n,))
        t_2 = jnp.broadcast_to(pair[1], (n,))
        x, _, pred = prk_step(eps_fn, x, t_1, t_2)
        return (x, pred), None

    pairs = jnp.stack(_step_pairs(ts), axis=-1)
    (x, pred), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), pairs)
    return x, pred


def plms_sample(eps_fn: EpsFn, x, ts):
    """Fused PLMS sampler: 3 unrolled PRK warm-up steps, then one
    `lax.scan` carrying the eps history. Returns (x_final, pred_final)."""
    ts = jnp.asarray(ts, jnp.float32)
    n = x.shape[0]
    n_steps = int(ts.shape[0]) - 1

    history = []
    pred = jnp.zeros_like(x)
    for i in range(min(3, n_steps)):
        t_1 = jnp.broadcast_to(ts[i], (n,))
        t_2 = jnp.broadcast_to(ts[i + 1], (n,))
        x, eps, pred = prk_step(eps_fn, x, t_1, t_2)
        history.append(eps)
    if n_steps <= 3:
        return x, pred

    def body(carry, pair):
        x, e0, e1, e2 = carry
        t_1 = jnp.broadcast_to(pair[0], (n,))
        t_2 = jnp.broadcast_to(pair[1], (n,))
        x, eps, pred = plms_step(eps_fn, x, (e0, e1, e2), t_1, t_2)
        return (x, e1, e2, eps), pred

    pairs = jnp.stack((ts[3:-1], ts[4:]), axis=-1)
    (x, *_), preds = jax.lax.scan(body, (x, *history), pairs)
    return x, preds[-1]


def ddim_reverse_sample(eps_fn: EpsFn, x, ts):
    """DDIM inversion: find the latent that deterministic (eta=0) sampling
    would decode into the given image (reference sampling.py:55-82).
    `ts` ascends from near 0 toward 1; returns the diffused x at ts[-1]."""
    ts = jnp.asarray(ts, jnp.float32)
    n = x.shape[0]

    def body(x, pair):
        t_1 = jnp.broadcast_to(pair[0], (n,))
        t_2 = jnp.broadcast_to(pair[1], (n,))
        eps = eps_fn(x, t_1)
        x, _ = transfer(x, eps, t_1, t_2)
        return x, None

    pairs = jnp.stack(_step_pairs(ts), axis=-1)
    x, _ = jax.lax.scan(body, x, pairs)
    return x
