"""OpenCLIP guidance loss (reference perceptor/losses/open_clip.py:7-97).

Note: the reference has a name-collision bug where `self.weights` (the
weights *name* string) is overwritten by the prompt-bank weights tensor
(reference losses/open_clip.py:45-46); here the bank uses `bank_weights`
so `weights_name` stays intact.
"""

from __future__ import annotations

from perceptor_tpu import models
from perceptor_tpu.losses.prompt_bank import PromptBankLoss


class OpenCLIP(PromptBankLoss):
    def __init__(
        self,
        architecture="ViT-B-32",
        weights="laion2b_s34b_b79k",
        precision=None,
        **kwargs,
    ):
        super().__init__(models.OpenCLIP(architecture, weights, precision, **kwargs))
        self.architecture = architecture
        self.weights_name = weights
