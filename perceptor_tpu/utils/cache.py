"""Weakref-keyed constructor memoization.

Mirrors reference perceptor/utils/cache.py:9-23: constructing the same model
wrapper twice with the same args returns the same live instance, so several
losses can share one frozen encoder's parameters (which on TPU means one HBM
copy of the weights).
"""

from __future__ import annotations

import weakref
from functools import wraps
from typing import TypeVar

T = TypeVar("T")


def cache(model: T) -> T:
    cached: weakref.WeakValueDictionary = weakref.WeakValueDictionary()
    strong: dict = {}

    @wraps(model)
    def wrapper(*args, **kwargs):
        key = str(args) + str(kwargs)
        if key in cached:
            return cached[key]
        instance = model(*args, **kwargs)
        try:
            cached[key] = instance
        except TypeError:
            # Values that can't be weakly referenced are kept strongly.
            strong[key] = instance
        return strong.get(key, instance)

    return wrapper
