"""Pure-pytree neural building blocks (flax.linen) for the StyleGAN2 stack.

Reference layer zoo: models/stylegan2/model.py:11-362.
"""

from where2edit_tpu.nn.layers import (
    PixelNorm,
    pixel_norm,
    EqualLinear,
    EqualConv2d,
    ScaledLeakyReLU,
    ModulatedConv2d,
    NoiseInjection,
    ConstantInput,
    StyledConv,
    ToRGB,
    Blur,
    Upsample,
    Downsample,
    ConvLayer,
    ResBlock,
)

__all__ = [
    "PixelNorm",
    "pixel_norm",
    "EqualLinear",
    "EqualConv2d",
    "ScaledLeakyReLU",
    "ModulatedConv2d",
    "NoiseInjection",
    "ConstantInput",
    "StyledConv",
    "ToRGB",
    "Blur",
    "Upsample",
    "Downsample",
    "ConvLayer",
    "ResBlock",
]
