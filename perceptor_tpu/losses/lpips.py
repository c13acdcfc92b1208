"""LPIPS loss (reference perceptor/losses/lpips.py:6-27)."""

from __future__ import annotations

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.lpips import LPIPS as LPIPSModel


class LPIPS(LossInterface):
    def __init__(self, name: str = "squeeze", linear_layers: bool = True,
                 spatial: bool = False):
        """Args mirror the reference (squeeze/alex/vgg backbones)."""
        self.model = LPIPSModel(name, linear_layers=linear_layers, spatial=spatial)

    def forward(self, images_a, images_b):
        """Pairwise distance; images (N,3,H,W) in [0,1]."""
        return self.model(images_a, images_b)
