"""SLIP guidance loss (reference perceptor/losses/slip.py)."""

from __future__ import annotations

from perceptor_tpu.losses.prompt_bank import PromptBankLoss
from perceptor_tpu.models.slip import SLIP as SLIPModel


class SLIP(PromptBankLoss):
    def __init__(self, name="SLIP_VITB16", **kwargs):
        super().__init__(SLIPModel(name, **kwargs))
        self.name = name
