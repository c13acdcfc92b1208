"""TPU kernels and differentiable ops.

Exports are EAGER imports: several export names (`attention`,
`bias_act`, `filtered_lrelu`) match their submodule filenames, and a
lazy `__getattr__` for those is unreliable — the first
`import perceptor_tpu.ops.attention` anywhere binds the submodule as a
package attribute, silently shadowing the function. Binding the
functions at package import keeps `ops.attention(q, k, v)` stable.

The one exception is `flash_attention`: its import is heavyweight
(pallas), so it stays lazy — and to make the lazy function export
reliable, the implementation module is named `flash_attention_kernel`
(a same-named submodule would shadow the function on first import).
"""

from perceptor_tpu.ops.attention import attention
from perceptor_tpu.ops.bias_act import bias_act
from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.ops.conv2d_resample import conv2d_resample
from perceptor_tpu.ops.deform_conv import deform_conv2d
from perceptor_tpu.ops.filtered_lrelu import filtered_lrelu
from perceptor_tpu.ops.fma import fma
from perceptor_tpu.ops.grid_sample import flow_warp, grid_sample
from perceptor_tpu.ops.groupnorm import group_norm, group_norm_silu
from perceptor_tpu.ops.resize import resize, resize_matrices
from perceptor_tpu.ops.upfirdn import upfirdn2d
from perceptor_tpu.ops.upsample_conv import upsample2x_nearest_conv3x3

__all__ = [
    "clamp_with_grad",
    "resize",
    "resize_matrices",
    "attention",
    "group_norm",
    "group_norm_silu",
    "bias_act",
    "upfirdn2d",
    "conv2d_resample",
    "fma",
    "filtered_lrelu",
    "deform_conv2d",
    "upsample2x_nearest_conv3x3",
    "grid_sample",
    "flow_warp",
    "flash_attention",
]


def __getattr__(name):
    if name == "flash_attention":
        from perceptor_tpu.ops.flash_attention_kernel import flash_attention

        globals()[name] = flash_attention
        return flash_attention
    raise AttributeError(f"module 'perceptor_tpu.ops' has no attribute {name!r}")
