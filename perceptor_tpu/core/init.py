"""Host-side parameter initialization.

Random-init of big frozen nets must not run op-by-op on the accelerator:
under a remote-compile TPU setup every tiny init op pays a compile
round-trip (observed: ~80s for a 2-layer test ViT). Initialize on the CPU
backend, then transfer once.
"""

from __future__ import annotations

import jax


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a flax `init` (or any fn) on CPU, return results on the default device."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out = init_fn(*args, **kwargs)
    default = jax.devices()[0]
    if default.platform == "cpu":
        return out
    return jax.device_put(out, default)
