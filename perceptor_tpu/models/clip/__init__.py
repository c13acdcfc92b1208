from perceptor_tpu.models.clip.configs import CLIPConfig, CONFIGS, get_config
from perceptor_tpu.models.clip.model import CLIP, VisionTransformer, TextTransformer
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.models.clip import convert

__all__ = [
    "CLIPConfig",
    "CONFIGS",
    "get_config",
    "CLIP",
    "VisionTransformer",
    "TextTransformer",
    "SimpleTokenizer",
    "tokenize",
    "convert",
]
