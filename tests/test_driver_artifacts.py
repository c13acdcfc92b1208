"""Driver-visible artifacts must not regress silently.

The round driver runs `bench.py` (headline metric) and
`__graft_entry__.py` (single-chip compile check + multi-chip dry run)
outside this suite; a break in either fails the round without any test
going red. Exercise their cheap paths here: the BENCH_QUICK program
builds and takes one finite guided step on the CPU mesh, and the entry
module imports with both driver hooks present and callable.
"""

from __future__ import annotations

import importlib
import os
import sys

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _import_repo_module(name):
    sys.path.insert(0, REPO)
    try:
        mod = importlib.import_module(name)
    finally:
        sys.path.remove(REPO)
    return mod


def test_bench_quick_builds_and_steps(monkeypatch):
    monkeypatch.setenv("BENCH_QUICK", "1")
    bench = importlib.reload(_import_repo_module("bench"))
    assert bench.QUICK, "BENCH_QUICK env must select the TINY config"
    step, scan, (unet_p, vae_p, clip_p), latents, context = bench.build()
    stepped, loss = step(unet_p, vae_p, clip_p, latents, context)
    assert stepped.shape == latents.shape
    assert bool(jnp.isfinite(loss))
    # the changed latents prove the DDIM update actually ran
    assert float(jnp.abs(stepped - latents).max()) > 0.0


def test_bench_mesh_arg_parsing():
    bench = _import_repo_module("bench")
    assert bench._parse_mesh_arg(["--mesh", "2x4"]) == (2, 4)
    assert bench._parse_mesh_arg(["--mesh=1x1"]) == (1, 1)
    assert bench._parse_mesh_arg(["--prime"]) is None


def test_graft_entry_hooks_present():
    mod = _import_repo_module("__graft_entry__")
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)
