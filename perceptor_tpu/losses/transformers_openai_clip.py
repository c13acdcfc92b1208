"""TransformersOpenAICLIP guidance loss (HF-layout CLIP prompt bank)."""

from __future__ import annotations

from perceptor_tpu.losses.prompt_bank import PromptBankLoss
from perceptor_tpu.models.transformers_openai_clip import TransformersOpenAICLIP as TransformersOpenAICLIPModel


class TransformersOpenAICLIP(PromptBankLoss):
    def __init__(self, name="openai/clip-vit-large-patch14", **kwargs):
        super().__init__(TransformersOpenAICLIPModel(name, **kwargs))
        self.name = name
