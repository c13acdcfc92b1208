"""conv2d_gradfix parity shim.

The reference vendors a custom conv2d autograd (StyleGAN's
conv2d_gradfix.py:25-198) for two cudnn-specific reasons: (1) second-order
gradients through conv2d, and (2) a `no_weight_gradients()` mode that
skips the weight-gradient kernel during guidance loops. Neither needs a
workaround on TPU/XLA: JAX autodiff is exact and composable to any order
(jax.grad of jax.grad of lax.conv works out of the box), and frozen-model
guidance never computes weight gradients in the first place because
gradients only flow to arguments that are differentiated — model params
passed as non-differentiated arguments cost nothing.

`no_weight_gradients` is kept as an explicit, jit-compatible helper for
API parity: wrap a params tree so any grad accidentally requested through
it is zero.
"""

from __future__ import annotations

import jax


def no_weight_gradients(params):
    """Return `params` with gradients blocked (lax.stop_gradient on every
    leaf). Matches the intent of the reference's context manager
    (conv2d_gradfix.py:35-43) in functional form."""
    return jax.tree.map(jax.lax.stop_gradient, params)
