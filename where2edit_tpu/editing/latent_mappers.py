"""StyleCLIP mapper family (reference: mapper/latent_mappers.py:1-128).

W+ mappers predict per-row latent deltas (applied as w + 0.1·Δ by the coach,
mapper/training/coach.py:88); StyleSpace variants operate per style vector.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as fnn

from where2edit_tpu.nn.layers import EqualLinear, pixel_norm

# mapper/training/train_utils.py:1 — 26 style-vector widths at 1024px
STYLESPACE_DIMENSIONS = [512] * 15 + [256] * 3 + [128] * 3 + [64] * 3 + [32] * 2
STYLESPACE_INDICES_WITHOUT_TORGB = [
    i for i in range(len(STYLESPACE_DIMENSIONS))
    if i not in list(range(1, len(STYLESPACE_DIMENSIONS), 3))
]


class Mapper(fnn.Module):
    """PixelNorm + 4× EqualLinear(512, lr_mul=0.01, fused lrelu)
    (latent_mappers.py:10-30).

    Quirk preserved: the reference's PixelNorm defaults to dim=1, which on a
    (B, rows, 512) input normalizes across the *row* axis, not features
    (models/stylegan2/model.py:11-17). 2-D inputs (StyleSpace variants flatten
    to (B, C)) hit the feature axis as intended.
    """
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, x):
        x = pixel_norm(x, axis=1)
        for i in range(4):
            x = EqualLinear(self.latent_dim, self.latent_dim, lr_mul=0.01,
                            activation="fused_lrelu", name=f"fc_{i}")(x)
        return x


class SingleMapper(fnn.Module):
    """latent_mappers.py:33-44."""

    @fnn.compact
    def __call__(self, x):
        return Mapper(name="mapping")(x)


class LevelsMapper(fnn.Module):
    """Coarse(0:4)/medium(4:8)/fine(8:) row groups (latent_mappers.py:47-83)."""
    no_coarse_mapper: bool = False
    no_medium_mapper: bool = False
    no_fine_mapper: bool = False

    @fnn.compact
    def __call__(self, x):
        coarse, medium, fine = x[:, :4], x[:, 4:8], x[:, 8:]
        coarse = (jnp.zeros_like(coarse) if self.no_coarse_mapper
                  else Mapper(name="course_mapping")(coarse))
        medium = (jnp.zeros_like(medium) if self.no_medium_mapper
                  else Mapper(name="medium_mapping")(medium))
        fine = (jnp.zeros_like(fine) if self.no_fine_mapper
                else Mapper(name="fine_mapping")(fine))
        return jnp.concatenate([coarse, medium, fine], axis=1)


class FullStyleSpaceMapper(fnn.Module):
    """One Mapper per style vector (latent_mappers.py:85-102)."""

    @fnn.compact
    def __call__(self, styles: Sequence[jnp.ndarray]):
        out = []
        for c, s in enumerate(styles):
            res = Mapper(latent_dim=STYLESPACE_DIMENSIONS[c],
                         name=f"mapper_{c}")(s.reshape(s.shape[0], -1))
            out.append(res.reshape(s.shape))
        return out


class WithoutToRGBStyleSpaceMapper(fnn.Module):
    """Skips every to_rgb style index (latent_mappers.py:105-127)."""

    @fnn.compact
    def __call__(self, styles: Sequence[jnp.ndarray]):
        out = []
        for c, s in enumerate(styles):
            if c in STYLESPACE_INDICES_WITHOUT_TORGB:
                res = Mapper(latent_dim=STYLESPACE_DIMENSIONS[c],
                             name=f"mapper_{c}")(s.reshape(s.shape[0], -1))
                out.append(res.reshape(s.shape))
            else:
                out.append(jnp.zeros_like(s))
        return out
