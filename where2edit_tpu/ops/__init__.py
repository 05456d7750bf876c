"""TPU compute primitives (the reference's CUDA-kernel layer, L0).

Reference equivalents:
  * upfirdn2d            — models/stylegan2/op/upfirdn2d.py:11-60
  * fused_leaky_relu     — models/stylegan2/op/fused_act.py:11-39
  * interpolate family   — torch F.interpolate call sites all over L5
"""

from where2edit_tpu.ops.upfirdn2d import upfirdn2d, make_kernel
from where2edit_tpu.ops.fused_act import fused_leaky_relu
from where2edit_tpu.ops.interpolate import (
    interpolate_nearest,
    interpolate_bilinear,
    adaptive_avg_pool,
)
from where2edit_tpu.ops.gaussian_blur import gaussian_blur
from where2edit_tpu.ops.segment import segment_mean_map

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "fused_leaky_relu",
    "interpolate_nearest",
    "interpolate_bilinear",
    "adaptive_avg_pool",
    "gaussian_blur",
    "segment_mean_map",
]
