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


class _StyleCell(fnn.Module):
    """Scan cell: one GradualStyleBlock on the (broadcast) carry feature."""
    spatial: int

    @fnn.compact
    def __call__(self, feat, _):
        y = GradualStyleBlock(512, 512, self.spatial, name="blk")(feat)
        return feat, y


class _EncoderBase(fnn.Module):
    """``dtype`` is an optional serving-time compute dtype (bf16 halves the
    trunk's HBM traffic; outputs are cast back to fp32 — the W+ rows feed
    fp32 style modulation). Default None keeps the torch-parity fp32 path."""
    num_layers: int = 50
    mode: str = "ir_se"
    stylegan_size: int = 1024
    coarse_ind: int = 3
    middle_ind: int = 7
    dtype: jnp.dtype | None = None

    @property
    def style_count(self) -> int:
        return 2 * int(math.log2(self.stylegan_size)) - 2

    def _trunk(self, x):
        return IRSEBody(self.num_layers, self.mode, dtype=self.dtype,
                        name="body")(x, want_taps=True)

    def _style_groups(self, c3, p2_fn, p1_fn):
        """Apply the 18 GradualStyleBlocks as THREE scanned groups.

        Every block within a group reads the same FPN level
        (psp_encoders.py:84-91), so each group runs as ONE nn.scan over
        stacked params (input broadcast via the carry) — one block body in
        HLO per group instead of N, identical numerics. nn.vmap would fuse
        harder (batched convs) but lowers to grouped convolutions with odd
        group counts (3/4/11), which the TPU compiler handles
        pathologically; scan keeps every conv a plain conv.
        p2/p1 are thunks so the FPN merge order matches the reference
        (latlayer1 before the middle group, latlayer2 before fine).
        Returns (coarse, middle, fine) with shapes (n_g, B, 512).
        """
        def group(n, spatial, name, feat):
            Scan = fnn.scan(_StyleCell,
                            variable_axes={"params": 0},
                            split_rngs={"params": True},
                            length=n)
            _, ys = Scan(spatial, name=name)(feat, None)
            return ys

        coarse = group(self.coarse_ind, 16, "styles_coarse", c3)
        p2 = p2_fn()
        middle = group(self.middle_ind - self.coarse_ind, 32,
                       "styles_middle", p2)
        p1 = p1_fn(p2)
        fine = group(self.style_count - self.middle_ind, 64,
                     "styles_fine", p1)
        return coarse, middle, fine


class GradualStyleEncoder(_EncoderBase):
    """pSp encoder (psp_encoders.py:58-121): full 18-style FPN readout."""

    @fnn.compact
    def __call__(self, x):
        _, taps = self._trunk(x)
        c1, c2, c3 = taps[6], taps[20], taps[23]
        coarse, middle, fine = self._style_groups(
            c3,
            lambda: _upsample_add(c3, Conv(256, 512, 1, name="latlayer1")(c2)),
            lambda p2: _upsample_add(p2, Conv(128, 512, 1,
                                              name="latlayer2")(c1)))
        # (n, B, 512) groups → (B, style_count, 512); W+ feeds fp32 styling
        return jnp.concatenate([coarse, middle, fine],
                               axis=0).transpose(1, 0, 2).astype(jnp.float32)


class Encoder4Editing(_EncoderBase):
    """e4e encoder (psp_encoders.py:124-200): base w0 + progressive deltas."""
    progressive_stage: int = PROGRESSIVE_STAGE_INFERENCE

    @fnn.compact
    def __call__(self, x):
        _, taps = self._trunk(x)
        c1, c2, c3 = taps[6], taps[20], taps[23]
        coarse, middle, fine = self._style_groups(
            c3,
            lambda: _upsample_add(c3, Conv(256, 512, 1, name="latlayer1")(c2)),
            lambda p2: _upsample_add(p2, Conv(128, 512, 1,
                                              name="latlayer2")(c1)))
        deltas = jnp.concatenate([coarse, middle, fine], axis=0)  # (n, B, 512)
        w0 = deltas[0]
        # progressive gating (psp_encoders.py:173-200): rows past the active
        # stage stay at w0; the stage is static so this is trace-time select
        limit = min(self.progressive_stage + 1, self.style_count)
        rows = [w0] + [w0 + deltas[i] if i < limit else w0
                       for i in range(1, self.style_count)]
        return jnp.stack(rows, axis=1).astype(jnp.float32)


class BackboneEncoderUsingLastLayerIntoW(_EncoderBase):
    """Single-W encoder (psp_encoders.py:203-235)."""

    @fnn.compact
    def __call__(self, x):
        feat, _ = self._trunk(x)
        pooled = jnp.mean(feat, axis=(1, 2))
        w = EqualLinear(512, 512, lr_mul=1.0, name="linear")(pooled)
        return jnp.repeat(w[:, None, :], self.style_count,
                          axis=1).astype(jnp.float32)
