"""Memorability loss (reference perceptor/losses/memorability.py:7-24) — pending.

The reference wraps the external `resmem` package (ResNet+AlexNet hybrid
memorability predictor, resize 256 + center-crop 227, mean * 0.05). The
ResMem architecture needs its own port + weights; callers fail loudly.
"""

from __future__ import annotations

from perceptor_tpu.losses.interface import LossInterface


class Memorability(LossInterface):
    def __init__(self):
        raise NotImplementedError(
            "Memorability needs a ResMem (ResNet152+AlexNet hybrid) port; "
            "planned for a later round"
        )
