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


def cast_matmul_params_bf16(tree):
    """bf16 STORAGE for matmul/conv/embedding weights (ndim >= 2); 1-D
    norm scales/biases and scalars stay fp32.

    The compute path casts weights to bf16 anyway (`dtype=bf16` modules),
    so pre-casting is numerically identical there while halving the
    weight HBM traffic — ~8 GB/step of fp32 UNet+VAE+CLIP reads in the
    512px fused guided step. This is the TPU analogue of the reference
    loading the fp16 weight revision (stable_diffusion.py:86-97).
    """
    import jax

    def cast(x):
        if (
            hasattr(x, "astype")
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree.map(cast, tree)


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
