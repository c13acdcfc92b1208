"""BLIP guidance loss (reference perceptor/losses/blip.py:10-82):
prompt bank with the model's ITC spherical distance."""

from __future__ import annotations

from perceptor_tpu.losses.prompt_bank import PromptBankLoss
from perceptor_tpu.models.blip import BLIP as BLIPModel


class BLIP(PromptBankLoss):
    def __init__(self, name="model_base_retrieval_flickr", **kwargs):
        super().__init__(BLIPModel(name, **kwargs))
        self.name = name
