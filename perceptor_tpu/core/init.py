"""Host-side parameter initialization.

Random-init of big frozen nets must not pay XLA compilation: this
environment has a single host core (eager init = hundreds of tiny
compiles; jitted init = one big compile — both tens of seconds even for
toy models, minutes for full UNets). `init_by_shape` avoids the compiler
entirely: `jax.eval_shape` traces the flax init to a shape tree (no
compile, milliseconds), then numpy fills the leaves fan-in-scaled on the
host. These fallback weights are placeholders for the pretrained
checkpoints (utils/checkpoints.py) — only their scale matters, to keep
activations / benchmarks representative.
"""

from __future__ import annotations

import jax
import numpy as np


def _fill(path: tuple, shape, dtype, rng: np.random.Generator) -> np.ndarray:
    name = str(path[-1]) if path else ""
    if not shape:  # scalars (e.g. logit_scale)
        return np.asarray(rng.normal(0.0, 1.0), dtype=dtype)
    if "scale" in name or name == "var":  # BN running var must stay > 0
        return np.ones(shape, dtype=dtype)
    if "bias" in name or name == "mean":
        return np.zeros(shape, dtype=dtype)
    fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
    std = 1.0 / np.sqrt(max(fan_in, 1))
    out = rng.standard_normal(size=shape, dtype=np.float32) * np.float32(std)
    return out.astype(dtype, copy=False)


def init_by_shape(init_fn, *args, seed: int = 0, **kwargs):
    """Shape-faithful random init without running the initializer graph."""
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = [
        _fill(tuple(getattr(k, "key", getattr(k, "name", k)) for k in path),
              leaf.shape, leaf.dtype, rng)
        for path, leaf in flat
    ]
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.device_put(tree, jax.devices()[0])


def init_on_cpu(init_fn, *args, **kwargs):
    """Backward-compatible alias: shape-based host init (see module doc)."""
    return init_by_shape(init_fn, *args, **kwargs)
