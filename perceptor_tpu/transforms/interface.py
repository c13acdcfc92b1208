"""Invertible differentiable transform interface.

Mirrors reference perceptor/transforms/interface.py:4-12. Transforms here are
stateless callables (pure functions of their inputs), so instances are safe
to close over inside jit.
"""

from __future__ import annotations


class TransformInterface:
    def __call__(self, *args, **kwargs):
        return self.encode(*args, **kwargs)

    def encode(self, *args, **kwargs):
        raise NotImplementedError

    def decode(self, *args, **kwargs):
        raise NotImplementedError
