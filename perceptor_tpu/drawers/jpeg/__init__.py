from perceptor_tpu.drawers.jpeg.jpeg import JPEG
from perceptor_tpu.drawers.jpeg.codec import (
    compress_jpeg,
    decompress_jpeg,
    diff_round,
    quality_to_factor,
)

__all__ = ["JPEG", "compress_jpeg", "decompress_jpeg", "diff_round", "quality_to_factor"]
