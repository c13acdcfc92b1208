"""Loss interface (reference perceptor/losses/interface.py:4-6).

A loss is a callable `loss(images) -> scalar` whose forward is pure given
the (host-side, pre-built) prompt bank, so it is safe to close over inside
jit / value_and_grad.
"""

from __future__ import annotations


class LossInterface:
    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):
        raise NotImplementedError
