"""Training-statistics collection, TPU-native.

Reference behavior: ``torch_utils/training_stats.py`` (vendored StyleGAN3
infra; ``report`` :64, ``report0`` :117, ``Collector`` :128, ``_sync``
:258) — a global-mutable registry of per-name moment counters
``[num, sum, sum_of_squares]`` synchronized across processes with
``torch.distributed.all_reduce``.

The TPU-first redesign makes the counters *data* instead of global state:

- a stats **bag** is a plain ``{name: Moments}`` dict — a pytree that flows
  through ``jit`` / ``lax.scan`` (e.g. as part of a scan carry), so stats
  can be reported from inside a fully fused training/sampling program at
  zero extra dispatch cost;
- ``report(bag, name, values)`` is pure: it returns a new bag;
- cross-device reduction needs no explicit collective in the common case:
  under ``jit`` with sharded inputs the moment sums are *already* global
  (XLA inserts the psum). Only per-device code inside ``shard_map`` needs
  the explicit ``axis_sum(bag, axis_name)`` (the JAX-collective equivalent
  of the reference's ``all_reduce`` at :278);
- the host-side :class:`Collector` keeps the reference's ergonomics and
  delta semantics (regex filter, ``update()`` windows, ``keep_previous``,
  ``mean/std/num/as_dict``) on top of float64 host accumulation (the
  reference's ``_counter_dtype`` :25).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu.core.pytree import Functional


class Moments(Functional):
    """``[num, sum, sum_of_squares]`` accumulator (one statistic name).

    Float32 on device (the reference's ``_reduce_dtype`` :24); the
    float64 long-term accumulation happens host-side in :class:`Collector`.
    """

    count: jnp.ndarray
    total: jnp.ndarray
    total_sq: jnp.ndarray

    @classmethod
    def zero(cls) -> "Moments":
        z = jnp.zeros((), jnp.float32)
        return cls(count=z, total=z, total_sq=z)

    def add(self, values) -> "Moments":
        """Accumulate an arbitrary set of scalars (any shape; flattened)."""
        v = jnp.asarray(values, jnp.float32).reshape(-1)
        return Moments(
            count=self.count + v.size,
            total=self.total + v.sum(),
            total_sq=self.total_sq + jnp.square(v).sum(),
        )

    def merge(self, other: "Moments") -> "Moments":
        return Moments(
            count=self.count + other.count,
            total=self.total + other.total,
            total_sq=self.total_sq + other.total_sq,
        )


def zeros(names) -> dict:
    """A fresh bag with the given statistic names.

    Inside ``jit``/``scan`` the bag's key set is part of the pytree
    structure and must be static — pre-declare every name the program
    reports (the reference has the same constraint across processes, see
    the warning in ``training_stats.py:73-77``).
    """
    return {name: Moments.zero() for name in names}


def report(bag: dict, name: str, values) -> dict:
    """Accumulate ``values`` under ``name``; returns a new bag.

    Reference: ``training_stats.report`` (:64) — there it mutates global
    per-device counters; here the bag is explicit so the call is pure and
    jit/scan-safe.
    """
    out = dict(bag)
    out[name] = bag.get(name, Moments.zero()).add(values)
    return out


def report0(bag: dict, name: str, values) -> dict:
    """Accumulate only on process 0 (reference ``report0`` :117).

    ``jax.process_index()`` is a host-time constant, so under jit this
    simply traces to either the accumulation or the identity.
    """
    if jax.process_index() != 0:
        # keep the name present so bag structure stays consistent
        out = dict(bag)
        out.setdefault(name, Moments.zero())
        return out
    return report(bag, name, values)


def merge(a: dict, b: dict) -> dict:
    """Union-merge two bags (moments of shared names add)."""
    out = dict(a)
    for name, m in b.items():
        out[name] = out[name].merge(m) if name in out else m
    return out


def axis_sum(bag: dict, axis_name) -> dict:
    """Sum a bag over a mesh axis — call inside ``shard_map``/``pmap``.

    The explicit-collective path (``jax.lax.psum``), equivalent to the
    reference's ``torch.distributed.all_reduce`` (:278). Code running
    under plain ``jit`` over sharded arrays does NOT need this: there the
    ``.sum()`` reductions in :meth:`Moments.add` are already global.
    """
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), bag)


def _np_moments(m: Moments) -> np.ndarray:
    return np.array(
        [float(m.count), float(m.total), float(m.total_sq)], dtype=np.float64
    )


class Collector:
    """Host-side view over bags reported between two ``update()`` calls.

    Mirrors the reference ``Collector`` (:128): ``update(bag)`` snapshots
    the cumulative counters and exposes the *delta* since the previous
    ``update()`` through ``num/mean/std/as_dict``; with ``keep_previous``
    (default) a statistic that received no scalars this round retains its
    previous averages.

    The one API difference is inherent to the functional design: the bag
    is passed to ``update(bag)`` explicitly instead of read from module
    globals. Bags that live inside a jitted loop only transfer to host
    here — once per collection window, like the reference's GPU→CPU
    copies in ``_sync``.
    """

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._cumulative: dict = {}
        self._moments: dict = {}

    def names(self):
        return [name for name in self._cumulative if self._regex.fullmatch(name)]

    def update(self, *bags: dict) -> None:
        """Fold one or more bags' current totals into the visible window.

        Each bag's values are cumulative (they grow monotonically as the
        program reports); the collector differences them against its own
        last snapshot, so reported windows compose exactly like the
        reference's counter deltas (:163-187).
        """
        if not self._keep_previous:
            self._moments.clear()
        totals: dict = {}
        for bag in bags:
            for name, m in bag.items():
                if not self._regex.fullmatch(name):
                    continue
                arr = _np_moments(m)
                totals[name] = totals.get(name, 0.0) + arr
        for name, cumulative in totals.items():
            previous = self._cumulative.get(name, np.zeros(3, np.float64))
            delta = cumulative - previous
            self._cumulative[name] = cumulative
            if delta[0] != 0:
                self._moments[name] = delta

    def add(self, *bags: dict) -> None:
        """Fold bags in as window *deltas* directly (no differencing).

        Use this for the fresh-bag-per-window pattern (e.g. a bag carried
        through one ``lax.scan`` call that started from :func:`zeros`);
        ``update()`` is for monotonically growing cumulative bags.
        """
        if not self._keep_previous:
            self._moments.clear()
        totals: dict = {}
        for bag in bags:
            for name, m in bag.items():
                if not self._regex.fullmatch(name):
                    continue
                totals[name] = totals.get(name, 0.0) + _np_moments(m)
        for name, delta in totals.items():
            self._cumulative[name] = (
                self._cumulative.get(name, np.zeros(3, np.float64)) + delta
            )
            if delta[0] != 0:
                self._moments[name] = delta

    def _get_delta(self, name) -> np.ndarray:
        assert self._regex.fullmatch(name)
        return self._moments.get(name, np.zeros(3, np.float64))

    def num(self, name) -> int:
        return int(self._get_delta(name)[0])

    def mean(self, name) -> float:
        delta = self._get_delta(name)
        if int(delta[0]) == 0:
            return float("nan")
        return float(delta[1] / delta[0])

    def std(self, name) -> float:
        """Population std over the window (reference semantics :218-229)."""
        delta = self._get_delta(name)
        if int(delta[0]) == 0 or not np.isfinite(delta[1]):
            return float("nan")
        if int(delta[0]) == 1:
            return 0.0
        mean = delta[1] / delta[0]
        raw_var = delta[2] / delta[0]
        return float(np.sqrt(max(raw_var - mean * mean, 0.0)))

    def as_dict(self) -> dict:
        return {
            name: {
                "num": self.num(name),
                "mean": self.mean(name),
                "std": self.std(name),
            }
            for name in self.names()
        }

    def __getitem__(self, name) -> float:
        return self.mean(name)
