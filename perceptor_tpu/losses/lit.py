"""LiT guidance loss (reference perceptor/losses/lit.py:10-81).

Prompt-bank spherical-distance loss over the LiT dual encoder
(models/lit.py).  The reference resizes inside the loss to the tower's
native resolution (lit.py:70-71); here the resize lives in the model's
`encode_images_fn`, inside the jitted/differentiated path, which is the
same computation.
"""

from __future__ import annotations

from perceptor_tpu import models
from perceptor_tpu.losses.prompt_bank import PromptBankLoss


class LiT(PromptBankLoss):
    def __init__(self, name: str = "LiT-L16L", **kwargs):
        """
        Args:
            name: "LiT-B16B_2" or "LiT-L16L" (reference lit.py:13-22)
        """
        super().__init__(models.LiT(name, **kwargs))
        self.name = name
