"""Parameter partitioning: regex path rules -> PartitionSpec.

Megatron-style tensor parallelism for the transformer/conv trees in this
package, applied through GSPMD: we annotate parameter shardings, XLA
propagates activation shardings and inserts the collectives (psum on the
row-parallel projections) over ICI. Column-parallel = shard the OUTPUT
feature dim; row-parallel = shard the INPUT dim; their composition needs
one all-reduce per block, which GSPMD derives automatically.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perceptor_tpu.parallel.mesh import AXIS_DATA, AXIS_TENSOR


class PartitionRules:
    """Ordered (regex, spec_fn) list; first match wins.

    `spec_fn(shape) -> PartitionSpec`. Falls back to full replication.
    A spec whose sharded dim doesn't divide by the mesh axis size is
    demoted to replication (small tiny-test layers stay replicated).
    """

    def __init__(self, rules: Sequence[Tuple[str, object]]):
        self.rules = [(re.compile(pattern), spec) for pattern, spec in rules]

    def spec_for(self, path: str, shape) -> P:
        for pattern, spec in self.rules:
            if pattern.search(path):
                return spec(shape) if callable(spec) else spec
        return P()


def _col(axis=AXIS_TENSOR):
    """Shard the last (output) dim."""
    return lambda shape: P(*([None] * (len(shape) - 1) + [axis]))


def _row(axis=AXIS_TENSOR):
    """Shard the second-to-last (input) dim of a matmul kernel."""
    return lambda shape: (
        P(*([None] * (len(shape) - 2) + [axis, None])) if len(shape) >= 2 else P()
    )


# Tensor-parallel rules for the stable_diffusion / clip module trees.
# qkv + first MLP projection are column-parallel; output projections are
# row-parallel; convs shard output channels (column) except shortcut/in/out
# stem convs which stay replicated (cheap, shape-fragile).
SD_TENSOR_PARALLEL_RULES = PartitionRules(
    [
        (r"(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$", _col()),
        (r"(to_out_0|out_proj)/kernel$", _row()),
        (r"(net_0_proj|fc1)/kernel$", _col()),
        (r"(net_2|fc2)/kernel$", _row()),
        (r"(conv1|conv2)/kernel$", _col()),
        (r"time_emb_proj/kernel$", _col()),
        (r".*", P()),
    ]
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def partition_params(params, rules: PartitionRules, mesh: Mesh):
    """params pytree -> PartitionSpec pytree (divisibility-checked)."""

    def spec(path, leaf):
        s = rules.spec_for(_path_str(path), np.shape(leaf))
        # demote to replication when the sharded dim doesn't divide
        for dim, axis in enumerate(s):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if np.shape(leaf)[dim] % size:
                return P()
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, rules: PartitionRules = SD_TENSOR_PARALLEL_RULES):
    """Place a param tree onto the mesh under the partition rules."""
    specs = partition_params(params, rules, mesh)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def shard_batch(tree, mesh: Mesh, axis: str = AXIS_DATA):
    """Shard the leading (batch) dim of every leaf over the data axis."""

    def place(leaf):
        spec = P(axis, *([None] * (np.ndim(leaf) - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )


def shard_for_sampling(mesh: Mesh, params, latents, *replicated, rules=None):
    """The common `sample(mesh=)` plumbing shared by the family samplers:
    params placed by the tensor-parallel rules (leaves no rule matches —
    or that don't divide — are replicated), the latent batch sharded over
    the data axis when divisible (replicated otherwise), everything else
    replicated. Under a mesh with a context axis (parallel/plan.py) the
    latents shard SPATIALLY (H over context) instead, feeding the
    context-parallel attention routing. Returns
    ``(params, latents, *replicated)``; None entries pass through."""
    from perceptor_tpu.parallel.plan import plan_for_mesh

    kwargs = {} if rules is None else {"rules": rules}
    params = shard_params(params, mesh, **kwargs)
    plan = plan_for_mesh(mesh)
    if (
        plan is not None
        and latents.ndim >= 3
        and latents.shape[2] % plan.n_context == 0
    ):
        spec = plan.spatial_spec(latents.ndim, 2, latents.shape[0])
        latents = jax.device_put(latents, NamedSharding(mesh, spec))
    elif latents.shape[0] % mesh.shape[AXIS_DATA] == 0:
        latents = shard_batch(latents, mesh)
    else:
        latents = replicate(latents, mesh)
    reps = tuple(
        replicate(r, mesh) if r is not None else None for r in replicated
    )
    return (params, latents) + reps
