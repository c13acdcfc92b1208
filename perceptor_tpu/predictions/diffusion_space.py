"""[0,1] image space <-> [-1,1] diffusion x-space.

Functional spec: reference perceptor/models/velocity_diffusion/diffusion_space.py:3-8
(and the identical stable_diffusion/diffusion_space.py).
"""

from __future__ import annotations


def encode(images):
    """[0,1] images -> [-1,1] xs."""
    return images * 2.0 - 1.0


def decode(xs):
    """[-1,1] xs -> [0,1] images."""
    return (xs + 1.0) / 2.0
