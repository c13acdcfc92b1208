"""Mixed-precision policy.

The reference sprinkles `torch.cuda.amp.autocast()` at every model boundary
(reference perceptor/models/velocity_diffusion/velocity_diffusion.py:96,
stable_diffusion/stable_diffusion.py:175) and converts frozen nets to fp16 on
cuda. On TPU the idiom is explicit: parameters live in fp32 (or bf16 for
frozen nets), activations compute in bf16 on the MXU, and reductions /
schedule math stay in fp32. A `Policy` makes that one declarative object.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


def default_policy() -> Policy:
    """bf16 compute, fp32 params/outputs — the TPU analogue of autocast."""
    return Policy()


def half_policy() -> Policy:
    """bf16 everywhere — for frozen inference-only nets (reference .half())."""
    return Policy(
        param_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        output_dtype=jnp.float32,
    )


def full_policy() -> Policy:
    """fp32 everywhere — for parity tests against the PyTorch reference."""
    return Policy(
        param_dtype=jnp.float32,
        compute_dtype=jnp.float32,
        output_dtype=jnp.float32,
    )
