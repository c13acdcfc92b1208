"""utils.session + utils.profiling tests."""

import jax
import jax.numpy as jnp
import numpy as np


def test_session_save_load_roundtrip(tmp_path):
    import optax

    from perceptor_tpu.utils.session import load_session, save_session

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    key = jax.random.key(42)
    state = {"params": params, "opt_state": opt_state, "key": key, "step": 7}

    path = save_session(str(tmp_path / "session"), state)

    fresh = {
        "params": jax.tree.map(jnp.zeros_like, params),
        "opt_state": optimizer.init(params),
        "key": jax.random.key(0),
        "step": 0,
    }
    restored = load_session(path, like=fresh)
    assert int(restored["step"]) == 7
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    # the PRNG key resumes the exact stream
    a = jax.random.normal(restored["key"], (4,))
    b = jax.random.normal(key, (4,))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer state round-trips (count + moments)
    updates, _ = optimizer.update(jax.tree.map(jnp.ones_like, params), restored["opt_state"], restored["params"])
    assert jax.tree.structure(updates) == jax.tree.structure(params)


def test_step_timer_and_trace(tmp_path):
    from perceptor_tpu.utils.profiling import StepTimer, annotate

    timer = StepTimer()
    f = jax.jit(lambda x: x * 2.0)
    for _ in range(3):
        with timer.step() as probe:
            with annotate("double"):
                probe(f(jnp.ones((8, 8))))
    s = timer.summary()
    assert s["steps"] == 2 and s["mean_s"] > 0 and s["steps_per_sec"] > 0


def test_memory_stats_and_live_array_bytes():
    from perceptor_tpu.utils import live_array_bytes, memory_stats

    stats = memory_stats()  # CPU backend may report {} — must not raise
    assert isinstance(stats, dict)
    x = jnp.ones((256, 256), jnp.float32)
    x.block_until_ready()
    total = live_array_bytes()
    assert total >= x.nbytes
    per_dev = live_array_bytes(jax.devices()[0])
    assert 0 <= per_dev <= total


def test_session_manager_interval_retention_resume(tmp_path):
    import optax

    from perceptor_tpu.utils.session import SessionManager

    params = {"w": jnp.arange(4.0), "k": jax.random.key(3)}
    optimizer = optax.sgd(0.1)
    state = {"params": params, "opt": optimizer.init({"w": params["w"]})}

    with SessionManager(
        str(tmp_path / "ckpt"), max_to_keep=2, save_interval_steps=5
    ) as mgr:
        saved_steps = []
        for step in range(0, 16):
            st = dict(state)
            st["params"] = dict(params, w=params["w"] + step)
            if mgr.save(step, st):
                saved_steps.append(step)
        mgr.wait()
        # interval policy: every 5th step
        assert saved_steps == [0, 5, 10, 15]
        assert mgr.latest_step() == 15
        # force overrides the interval
        assert mgr.save(16, state, force=True)
        mgr.wait()
        assert mgr.latest_step() == 16

        fresh = {
            "params": {"w": jnp.zeros((4,)), "k": jax.random.key(0)},
            "opt": optimizer.init({"w": jnp.zeros((4,))}),
        }
        step, restored = mgr.restore_latest(fresh)
        assert step == 16
        np.testing.assert_allclose(
            np.asarray(restored["params"]["w"]), np.arange(4.0)
        )
        # PRNG key resumes the exact stream
        np.testing.assert_allclose(
            np.asarray(jax.random.normal(restored["params"]["k"], (2,))),
            np.asarray(jax.random.normal(params["k"], (2,))),
        )
        # no preemption signal in a single-process test environment
        assert mgr.reached_preemption(16) is False


def test_session_manager_idempotent_resave(tmp_path):
    from perceptor_tpu.utils.session import SessionManager

    state = {"w": jnp.ones((2,))}
    with SessionManager(str(tmp_path / "c"), save_interval_steps=1) as mgr:
        assert mgr.save(3, state, force=True)
        mgr.wait()
        # resuming exactly at a checkpointed step must be a no-op, not a crash
        assert mgr.save(3, state, force=True) is False
        assert mgr.latest_step() == 3
