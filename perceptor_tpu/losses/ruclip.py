"""RuCLIP guidance loss (reference perceptor/losses/ruclip.py)."""

from __future__ import annotations

from perceptor_tpu.losses.prompt_bank import PromptBankLoss
from perceptor_tpu.models.ruclip import RuCLIP as RuCLIPModel


class RuCLIP(PromptBankLoss):
    def __init__(self, name="ruclip-vit-base-patch32-224", **kwargs):
        super().__init__(RuCLIPModel(name, **kwargs))
        self.name = name
