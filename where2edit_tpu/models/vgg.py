"""VGG16 feature extractor for the perceptual loss, NHWC.

Reference: criteria/perceptual_loss.py:26-58 — torchvision vgg16.features
sliced at relu1_2 / relu2_2 / relu3_3 / relu4_3. Weights come from a
torchvision-layout state dict via convert.vgg (torchvision itself is not a
runtime dependency).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import linen as fnn
from jax import lax

from where2edit_tpu.models.irse import Conv

# torchvision vgg16.features conv positions and channel plan (through relu4_3)
VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
]
_POOL_BEFORE = {5, 10, 17}  # maxpool sits before these conv indices
_TAPS = {2: "relu1_2", 7: "relu2_2", 14: "relu3_3", 21: "relu4_3"}


class VggFeatures(NamedTuple):
    relu1_2: jnp.ndarray
    relu2_2: jnp.ndarray
    relu3_3: jnp.ndarray
    relu4_3: jnp.ndarray


def _max_pool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID")


class Vgg16(fnn.Module):
    """Conv trunk through relu4_3 with the four perceptual taps."""

    @fnn.compact
    def __call__(self, x) -> VggFeatures:
        taps = {}
        for idx, cin, cout in VGG16_CONVS:
            if idx in _POOL_BEFORE:
                x = _max_pool2(x)
            x = Conv(cin, cout, 3, padding=1, name=f"conv_{idx}")(x)
            x = jnp.maximum(x, 0.0)
            if idx in _TAPS:
                taps[_TAPS[idx]] = x
        return VggFeatures(**taps)
