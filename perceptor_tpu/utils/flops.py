"""Analytic FLOP counting by jaxpr traversal.

XLA's `compiled.cost_analysis()["flops"]` on TPU undercounts heavily
(post-fusion HLO accounting; measured ~10x low on the fused guided step),
so MFU claims here are computed from the traced jaxpr instead: walk every
equation, count `2 * prod(out) * K` for dot_general / conv_general_dilated
(the >99% FLOP carriers in these models), multiply through scan lengths,
recurse into pjit/remat/custom-vjp sub-jaxprs.

Counting convention: one multiply-add = 2 FLOPs; forward-only unless you
trace the VJP'd function itself (count what you trace).
"""

from __future__ import annotations

import math

import jax
from jax.extend.core import ClosedJaxpr, Jaxpr


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _eqn_flops(eqn) -> int:
    name = eqn.primitive.name
    if name == "dot_general":
        (lhs_c, _), _ = eqn.params["dimension_numbers"]
        lhs = eqn.invars[0].aval.shape
        out = eqn.outvars[0].aval.shape
        k = _prod(lhs[i] for i in lhs_c)
        return 2 * _prod(out) * k
    if name == "conv_general_dilated":
        rhs = eqn.invars[1].aval.shape
        out = eqn.outvars[0].aval.shape
        rhs_spec = eqn.params["dimension_numbers"].rhs_spec
        # kernel dims except the out-feature dim: in_features/group * spatial
        k = _prod(rhs[i] for i in rhs_spec[1:])
        return 2 * _prod(out) * k
    return 0


def _sub_jaxprs(params: dict):
    for value in params.values():
        if isinstance(value, ClosedJaxpr):
            yield value.jaxpr
        elif isinstance(value, Jaxpr):
            yield value
        elif isinstance(value, (tuple, list)):
            for item in value:
                if isinstance(item, ClosedJaxpr):
                    yield item.jaxpr
                elif isinstance(item, Jaxpr):
                    yield item


def _pallas_grid_size(eqn) -> int:
    """Product of a pallas_call's grid dims (1 when absent)."""
    gm = eqn.params.get("grid_mapping")
    grid = getattr(gm, "grid", None) or ()
    return _prod(int(g) for g in grid)


def _walk(jaxpr, mult: int = 1) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            total += _walk(inner, mult * int(eqn.params["length"]))
        elif name == "pallas_call":
            # the kernel jaxpr is ONE grid block: multiply through the
            # grid (the repo's flash kernels put the k/v loop in the
            # grid, so this is exact for them). NOTE this counts
            # PERFORMED FLOPs — lane padding included (head_dim 40 pads
            # to 128 in the flash blocks); for model FLOPs trace under
            # ops.attention.model_flops_trace (see count_model_flops).
            total += _walk(eqn.params["jaxpr"], mult * _pallas_grid_size(eqn))
        elif name == "while":
            # no static trip count: count one iteration (caller beware)
            for sub in _sub_jaxprs(eqn.params):
                total += _walk(sub, mult)
        elif name == "cond":
            total += mult and max(
                (_walk(b, mult) for b in _sub_jaxprs(eqn.params)), default=0
            )
        else:
            subs = list(_sub_jaxprs(eqn.params))
            if subs:
                for sub in subs:
                    total += _walk(sub, mult)
            else:
                total += mult * _eqn_flops(eqn)
    return total


def count_flops(fn, *args, **kwargs) -> int:
    """Matmul/conv FLOPs of one call of `fn(*args, **kwargs)` (traced).

    Counts what the trace contains — on TPU that means PERFORMED FLOPs
    (Pallas kernel blocks x grid, lane padding included). For the
    backend-independent model-FLOPs number use `count_model_flops`.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _walk(closed.jaxpr)


def count_model_flops(fn, *args, **kwargs) -> int:
    """Model (mathematical) matmul/conv FLOPs of one call — the MFU
    numerator (docs/PERFORMANCE.md "MFU counter reconciliation").

    Traces under ops.attention.model_flops_trace so every attention
    takes the XLA route at the true head_dim: the score/value dots are
    visible to the counter and the flash path's 128-lane padding is
    excluded. Clears the jit trace caches before AND after — before, so
    already-traced callables re-trace under the override; after, so no
    cached XLA-path trace can leak into a later real execution.
    """
    from perceptor_tpu.ops.attention import model_flops_trace

    jax.clear_caches()
    try:
        with model_flops_trace():
            closed = jax.make_jaxpr(fn)(*args, **kwargs)
            return _walk(closed.jaxpr)
    finally:
        jax.clear_caches()


def _walk_by_op(jaxpr, mult: int, out: dict) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            _walk_by_op(inner, mult * int(eqn.params["length"]), out)
        elif name == "pallas_call":
            _walk_by_op(
                eqn.params["jaxpr"], mult * _pallas_grid_size(eqn), out
            )
        elif name in ("while", "cond"):
            for sub in _sub_jaxprs(eqn.params):
                _walk_by_op(sub, mult, out)
        else:
            subs = list(_sub_jaxprs(eqn.params))
            if subs:
                for sub in subs:
                    _walk_by_op(sub, mult, out)
            else:
                f = mult * _eqn_flops(eqn)
                if not f:
                    continue
                if name == "dot_general":
                    (lhs_c, _), _ = eqn.params["dimension_numbers"]
                    lhs = eqn.invars[0].aval.shape
                    k = _prod(lhs[i] for i in lhs_c)
                    shape = tuple(eqn.outvars[0].aval.shape)
                    key = f"dot {shape} k={k}"
                else:
                    rhs = tuple(eqn.invars[1].aval.shape)
                    shape = tuple(eqn.outvars[0].aval.shape)
                    key = f"conv {shape} rhs={rhs}"
                bucket = out.setdefault(key, [0, 0])
                bucket[0] += f
                bucket[1] += mult


def count_flops_by_op(fn, *args, **kwargs) -> dict:
    """Per-op FLOP breakdown of one traced call: {label: (flops, count)}
    where label identifies the op kind + output shape + contraction size.

    The reconciliation tool behind the headline MFU number
    (docs/PERFORMANCE.md "MFU counter reconciliation"): diffing two
    programs' breakdowns shows exactly which lowerings moved the total.
    Note `cond` branches are SUMMED here (upper bound), where
    `count_flops` takes the max branch — totals can differ on programs
    with `lax.cond`; none of the bench programs branch.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    out: dict = {}
    _walk_by_op(closed.jaxpr, 1, out)
    return {k: tuple(v) for k, v in out.items()}


def mfu(flops: int, seconds: float, peak_tflops: float = 197.0) -> float:
    """Model FLOP utilization vs a chip peak (v5e bf16: 197 TFLOP/s)."""
    if not math.isfinite(seconds) or seconds <= 0:
        raise ValueError("seconds must be positive")
    return flops / seconds / (peak_tflops * 1e12)
