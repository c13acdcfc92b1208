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


def _walk(jaxpr, mult: int = 1) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            total += _walk(inner, mult * int(eqn.params["length"]))
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
    """Matmul/conv FLOPs of one call of `fn(*args, **kwargs)` (traced)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _walk(closed.jaxpr)


def mfu(flops: int, seconds: float, peak_tflops: float = 197.0) -> float:
    """Model FLOP utilization vs a chip peak (v5e bf16: 197 TFLOP/s)."""
    if not math.isfinite(seconds) or seconds <= 0:
        raise ValueError("seconds must be positive")
    return flops / seconds / (peak_tflops * 1e12)
