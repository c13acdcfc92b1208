from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.ops.resize import resize, resize_matrices

__all__ = [
    "clamp_with_grad",
    "resize",
    "resize_matrices",
    "attention",
    "group_norm",
    "group_norm_silu",
    "bias_act",
    "upfirdn2d",
    "filtered_lrelu",
    "deform_conv2d",
    "upsample2x_nearest_conv3x3",
]


def __getattr__(name):
    import importlib

    lazy = {
        "attention": ("perceptor_tpu.ops.attention", "attention"),
        "flash_attention": ("perceptor_tpu.ops.attention", "flash_attention"),
        "group_norm": ("perceptor_tpu.ops.groupnorm", "group_norm"),
        "group_norm_silu": ("perceptor_tpu.ops.groupnorm", "group_norm_silu"),
        "bias_act": ("perceptor_tpu.ops.bias_act", "bias_act"),
        "upfirdn2d": ("perceptor_tpu.ops.upfirdn", "upfirdn2d"),
        "deform_conv2d": ("perceptor_tpu.ops.deform_conv", "deform_conv2d"),
        "upsample2x_nearest_conv3x3": (
            "perceptor_tpu.ops.upsample_conv",
            "upsample2x_nearest_conv3x3",
        ),
        "filtered_lrelu": ("perceptor_tpu.ops.filtered_lrelu", "filtered_lrelu"),
    }
    if name in lazy:
        module_name, attr = lazy[name]
        value = getattr(importlib.import_module(module_name), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'perceptor_tpu.ops' has no attribute {name!r}")
