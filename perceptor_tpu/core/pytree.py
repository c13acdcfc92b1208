"""Immutable pytree value objects.

The reference builds its diffusion `Predictions` objects on
pytorch-lantern's `FunctionalBase` (pydantic-style immutable records with
`.replace()`, see reference perceptor/models/velocity_diffusion/predictions.py:9).
On TPU the natural equivalent is a frozen dataclass registered as a JAX
pytree: instances flow through `jit`/`grad`/`vmap`/`lax.scan` unchanged, and
`.replace()` is non-destructive functional update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T", bound="Functional")


def field(**kwargs) -> Any:
    """A pytree-leaf field (participates in jax transformations)."""
    return dataclasses.field(**kwargs)


def static_field(**kwargs) -> Any:
    """A static (hashable, trace-time constant) field.

    Static fields are part of the pytree *structure*: changing them
    retriggers compilation, and they may hold non-array python values
    (callables, strings, shapes).
    """
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


class _FunctionalMeta(type):
    def __new__(mcs, name, bases, namespace, **kwargs):
        cls = super().__new__(mcs, name, bases, namespace, **kwargs)
        if name == "Functional" and not bases:
            return cls
        cls = dataclasses.dataclass(frozen=True)(cls)

        data_names = []
        static_names = []
        for f in dataclasses.fields(cls):
            if f.metadata.get("static", False):
                static_names.append(f.name)
            else:
                data_names.append(f.name)

        def flatten_with_keys(obj):
            children = tuple(
                (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
            )
            aux = tuple(getattr(obj, n) for n in static_names)
            return children, aux

        def flatten(obj):
            children = tuple(getattr(obj, n) for n in data_names)
            aux = tuple(getattr(obj, n) for n in static_names)
            return children, aux

        def unflatten(aux, children):
            kw = dict(zip(data_names, children))
            kw.update(dict(zip(static_names, aux)))
            return cls(**kw)

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten
        )
        return cls


class Functional(metaclass=_FunctionalMeta):
    """Base class for immutable pytree value objects.

    Subclass, declare typed fields, get: frozen dataclass + pytree
    registration + `.replace()` (the lantern FunctionalBase API the
    reference's Predictions algebra relies on).
    """

    def replace(self: T, **changes) -> T:
        return dataclasses.replace(self, **changes)
