"""GAN-inversion encoders (pSp / e4e families), NHWC.

Reference: models/encoders/psp_encoders.py:34-235. All three encoders share
the IR-SE50 trunk with FPN taps at body indices 6/20/23 and 18
GradualStyleBlocks (coarse 0-2 @16², middle 3-6 @32², fine 7-17 @64²).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as fnn

from where2edit_tpu.models.irse import Conv, IRSEBody
from where2edit_tpu.nn.layers import EqualLinear
from where2edit_tpu.ops.interpolate import interpolate_bilinear

# psp_encoders.py:12-31 — progressive training stages for e4e
PROGRESSIVE_STAGE_INFERENCE = 18


def _upsample_add(x, y):
    """Bilinear (align_corners=True) FPN merge (helpers.py:123-140)."""
    return interpolate_bilinear(x, (y.shape[1], y.shape[2]), align_corners=True) + y


class GradualStyleBlock(fnn.Module):
    """psp_encoders.py:34-55: log2(spatial) stride-2 convs + lrelu(0.01) + EqualLinear."""
    in_c: int
    out_c: int
    spatial: int

    @fnn.compact
    def __call__(self, x):
        num_pools = int(math.log2(self.spatial))
        x = Conv(self.in_c, self.out_c, 3, stride=2, padding=1, name="conv_0")(x)
        x = jnp.where(x >= 0, x, 0.01 * x)
        for i in range(num_pools - 1):
            x = Conv(self.out_c, self.out_c, 3, stride=2, padding=1,
                     name=f"conv_{i + 1}")(x)
            x = jnp.where(x >= 0, x, 0.01 * x)
        x = x.reshape(x.shape[0], self.out_c)
        return EqualLinear(self.out_c, self.out_c, lr_mul=1.0, name="linear")(x)


class _EncoderBase(fnn.Module):
    num_layers: int = 50
    mode: str = "ir_se"
    stylegan_size: int = 1024
    coarse_ind: int = 3
    middle_ind: int = 7

    @property
    def style_count(self) -> int:
        return 2 * int(math.log2(self.stylegan_size)) - 2

    def _trunk(self, x):
        return IRSEBody(self.num_layers, self.mode, name="body")(x, want_taps=True)

    def _style_blocks(self):
        blocks = []
        for i in range(self.style_count):
            if i < self.coarse_ind:
                blocks.append(GradualStyleBlock(512, 512, 16, name=f"style_{i}"))
            elif i < self.middle_ind:
                blocks.append(GradualStyleBlock(512, 512, 32, name=f"style_{i}"))
            else:
                blocks.append(GradualStyleBlock(512, 512, 64, name=f"style_{i}"))
        return blocks


class GradualStyleEncoder(_EncoderBase):
    """pSp encoder (psp_encoders.py:58-121): full 18-style FPN readout."""

    @fnn.compact
    def __call__(self, x):
        _, taps = self._trunk(x)
        c1, c2, c3 = taps[6], taps[20], taps[23]
        styles = self._style_blocks()

        latents = [styles[j](c3) for j in range(self.coarse_ind)]
        p2 = _upsample_add(c3, Conv(256, 512, 1, name="latlayer1")(c2))
        latents += [styles[j](p2) for j in range(self.coarse_ind, self.middle_ind)]
        p1 = _upsample_add(p2, Conv(128, 512, 1, name="latlayer2")(c1))
        latents += [styles[j](p1) for j in range(self.middle_ind, self.style_count)]
        return jnp.stack(latents, axis=1)


class Encoder4Editing(_EncoderBase):
    """e4e encoder (psp_encoders.py:124-200): base w0 + progressive deltas."""
    progressive_stage: int = PROGRESSIVE_STAGE_INFERENCE

    @fnn.compact
    def __call__(self, x):
        _, taps = self._trunk(x)
        c1, c2, c3 = taps[6], taps[20], taps[23]
        styles = self._style_blocks()

        w0 = styles[0](c3)
        rows = [w0]
        features = c3
        p2 = None
        for i in range(1, self.style_count):
            if i < min(self.progressive_stage + 1, self.style_count):
                if i == self.coarse_ind:
                    p2 = _upsample_add(c3, Conv(256, 512, 1, name="latlayer1")(c2))
                    features = p2
                elif i == self.middle_ind:
                    p1 = _upsample_add(p2, Conv(128, 512, 1, name="latlayer2")(c1))
                    features = p1
                rows.append(w0 + styles[i](features))
            else:
                rows.append(w0)
        return jnp.stack(rows, axis=1)


class BackboneEncoderUsingLastLayerIntoW(_EncoderBase):
    """Single-W encoder (psp_encoders.py:203-235)."""

    @fnn.compact
    def __call__(self, x):
        feat, _ = self._trunk(x)
        pooled = jnp.mean(feat, axis=(1, 2))
        w = EqualLinear(512, 512, lr_mul=1.0, name="linear")(pooled)
        return jnp.repeat(w[:, None, :], self.style_count, axis=1)
