"""InceptionV3 feature extractor for FID/IS, NHWC.

The reference computes IS/FID through torch-fidelity (utils.py:537-548),
whose backbone is torchvision InceptionV3 (pool3 features, 2048-d + 1008-way
logits). This is the same architecture in flax; weights load through
convert.inception from a torchvision-layout state dict.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as fnn
from jax import lax


class BasicConv2d(fnn.Module):
    """Conv + BN(eps=1e-3) + ReLU (torchvision BasicConv2d)."""
    in_ch: int
    out_ch: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @fnn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param("weight", fnn.initializers.lecun_normal(),
                       (kh, kw, self.in_ch, self.out_ch))
        x = lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            ((self.padding[0], self.padding[0]),
             (self.padding[1], self.padding[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = fnn.BatchNorm(use_running_average=True, epsilon=1e-3,
                          use_scale=True, use_bias=True, name="bn")(x)
        return jnp.maximum(x, 0.0)


def _max_pool(x, k=3, s=2):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, s, s, 1), "VALID")


def _avg_pool3(x):
    out = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                            ((0, 0), (1, 1), (1, 1), (0, 0)))
    # torch avg_pool2d(count_include_pad=True) divides by 9 everywhere
    return out / 9.0


class InceptionA(fnn.Module):
    in_ch: int
    pool_ch: int

    @fnn.compact
    def __call__(self, x):
        b1 = BasicConv2d(self.in_ch, 64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(self.in_ch, 48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(48, 64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(self.in_ch, 64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(64, 96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, 96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool3(x)
        bp = BasicConv2d(self.in_ch, self.pool_ch, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(fnn.Module):
    in_ch: int

    @fnn.compact
    def __call__(self, x):
        b3 = BasicConv2d(self.in_ch, 384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(self.in_ch, 64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(64, 96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, 96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(fnn.Module):
    in_ch: int
    c7: int

    @fnn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(self.in_ch, 192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(self.in_ch, c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(c7, 192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(self.in_ch, c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(c7, 192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool3(x)
        bp = BasicConv2d(self.in_ch, 192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(fnn.Module):
    in_ch: int

    @fnn.compact
    def __call__(self, x):
        b3 = BasicConv2d(self.in_ch, 192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(192, 320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(self.in_ch, 192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, 192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, 192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, 192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(fnn.Module):
    in_ch: int

    @fnn.compact
    def __call__(self, x):
        b1 = BasicConv2d(self.in_ch, 320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(self.in_ch, 384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, 384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, 384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(self.in_ch, 448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(448, 384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, 384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, 384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool3(x)
        bp = BasicConv2d(self.in_ch, 192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(fnn.Module):
    """Returns (pool3 2048-d features, logits). num_classes=1008 matches the
    FID-standard TF-ported checkpoint; torchvision's is 1000."""
    num_classes: int = 1008

    @fnn.compact
    def __call__(self, x):
        x = BasicConv2d(3, 32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, 32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(32, 64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(64, 80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(80, 192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(192, 32, name="Mixed_5b")(x)
        x = InceptionA(256, 64, name="Mixed_5c")(x)
        x = InceptionA(288, 64, name="Mixed_5d")(x)
        x = InceptionB(288, name="Mixed_6a")(x)
        x = InceptionC(768, 128, name="Mixed_6b")(x)
        x = InceptionC(768, 160, name="Mixed_6c")(x)
        x = InceptionC(768, 160, name="Mixed_6d")(x)
        x = InceptionC(768, 192, name="Mixed_6e")(x)
        x = InceptionD(768, name="Mixed_7a")(x)
        x = InceptionE(1280, name="Mixed_7b")(x)
        x = InceptionE(2048, name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → 2048
        w = self.param("fc_weight", fnn.initializers.lecun_normal(),
                       (2048, self.num_classes))
        b = self.param("fc_bias", fnn.initializers.zeros, (self.num_classes,))
        return feats, feats @ w + b
