"""CLOOB guidance loss (reference perceptor/losses/cloob.py:7-70)."""

from __future__ import annotations

from perceptor_tpu.losses.prompt_bank import PromptBankLoss
from perceptor_tpu.models.cloob import CLOOB as CLOOBModel


class CLOOB(PromptBankLoss):
    def __init__(self, name="16-epochs", **kwargs):
        super().__init__(CLOOBModel(name, **kwargs))
        self.name = name
