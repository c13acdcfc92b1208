"""Pipeline parallelism (GPipe microbatching) vs sequential execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import parallel
from perceptor_tpu.parallel.pipeline import pipeline


def _stages(key, n_stages, width):
    return {
        "w": 0.3 * jax.random.normal(key, (n_stages, width, width)),
        "b": jnp.linspace(-0.1, 0.1, n_stages)[:, None]
        * jnp.ones((n_stages, width)),
    }


def _stage_fn(params, x):
    return x + jnp.tanh(x @ params["w"] + params["b"])


def _sequential(stage_params, x, n_stages):
    for i in range(n_stages):
        x = _stage_fn(jax.tree.map(lambda p: p[i], stage_params), x)
    return x


@pytest.mark.parametrize("n_stages,n_micro", [(4, 8), (8, 8), (2, 4)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    mesh = parallel.create_mesh(
        data=1, stage=n_stages, devices=jax.devices()[:n_stages]
    )
    params = _stages(jax.random.PRNGKey(0), n_stages, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16))

    out = pipeline(_stage_fn, params, x, mesh, n_microbatches=n_micro)
    expected = _sequential(params, x, n_stages)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_pipeline_grads_match_sequential():
    n_stages = 4
    mesh = parallel.create_mesh(data=1, stage=n_stages, devices=jax.devices()[:4])
    params = _stages(jax.random.PRNGKey(2), n_stages, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 8))

    def pipe_loss(params):
        return jnp.sum(jnp.square(pipeline(_stage_fn, params, x, mesh, 4)))

    def seq_loss(params):
        return jnp.sum(jnp.square(_sequential(params, x, n_stages)))

    got = jax.grad(pipe_loss)(params)
    want = jax.grad(seq_loss)(params)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_pipeline_under_jit():
    mesh = parallel.create_mesh(data=1, stage=4, devices=jax.devices()[:4])
    params = _stages(jax.random.PRNGKey(4), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 8))
    out = jax.jit(lambda p, x: pipeline(_stage_fn, p, x, mesh, 4))(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(params, x, 4)), atol=1e-5
    )


def test_pipeline_validation():
    mesh = parallel.create_mesh(data=1, stage=4, devices=jax.devices()[:4])
    params = _stages(jax.random.PRNGKey(6), 3, 8)  # wrong stage count
    x = jnp.zeros((8, 8))
    with pytest.raises(ValueError):
        pipeline(_stage_fn, params, x, mesh, 4)
    with pytest.raises(ValueError):
        pipeline(_stage_fn, _stages(jax.random.PRNGKey(7), 4, 8), x, mesh, 3)
