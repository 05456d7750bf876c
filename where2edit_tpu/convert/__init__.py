"""Torch checkpoint → framework-native parameter converters.

Layout rules (torch → NHWC/JAX):
  * conv weight   (O, I, kh, kw)   → HWIO  (kh, kw, I, O)
  * linear weight (O, I)           → (I, O)
  * NCHW buffers  (N, C, H, W)     → (N, H, W, C)
"""

from where2edit_tpu.convert.stylegan2 import (
    convert_generator_params,
    convert_discriminator_params,
)

__all__ = ["convert_generator_params", "convert_discriminator_params"]
