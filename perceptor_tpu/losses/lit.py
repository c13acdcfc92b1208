"""LiT loss (reference perceptor/losses/lit.py:10-81) — pending.

The reference wraps the external `pytorch-zero-lit` package (Google LiT
dual encoders, LiT-B16B_2/LiT-L16L). The towers (AugReg ViT image +
BERT-style text with LiT's own vocab) need their own port + weights;
callers fail loudly rather than silently degrading.
"""

from __future__ import annotations

from perceptor_tpu.losses.interface import LossInterface


class LiT(LossInterface):
    def __init__(self, name: str = "LiT-L16L", cache_dir="models"):
        raise NotImplementedError(
            "LiT needs a port of the pytorch-zero-lit towers; planned for a "
            "later round"
        )
