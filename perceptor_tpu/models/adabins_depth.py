"""AdaBins depth (reference perceptor/models/adabins_depth/) — pending.

The reference's UnetAdaptiveBins uses a tf_efficientnet_b5_ap encoder
pulled from torch.hub (adabins_depth/models/unet_adaptive_bins.py:160-164);
an EfficientNet-B5 port is required before this model can run here. The
wrapper surface (area-based pre-resize to 448^2..500k px, nyu/kitti
checkpoints, adabins_depth.py:9-49) is reproduced so callers fail loudly
rather than silently.
"""

from __future__ import annotations

CHECKPOINTS = ("nyu", "kitti")


class AdaBinsDepth:
    def __init__(self, name: str = "nyu"):
        if name not in CHECKPOINTS:
            raise ValueError(f"unknown adabins checkpoint: {name}")
        raise NotImplementedError(
            "AdaBinsDepth needs an EfficientNet-B5 encoder port "
            "(reference pulls it from torch.hub); planned for a later round"
        )
