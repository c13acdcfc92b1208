"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (the standard JAX testing idiom).
Must run before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var — override it back so unit tests run hermetically on the CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# single-core host: persistent compilation cache makes repeat suite runs fast
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_tests")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
