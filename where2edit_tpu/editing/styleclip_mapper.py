"""StyleCLIPMapper composite (reference: mapper/styleclip_mapper.py:14-77).

Bundles a latent mapper + frozen StyleGAN2 decoder + 256² face pool, loading
either a trained coach checkpoint (native or torch) or raw g_ema weights.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from where2edit_tpu.editing import latent_mappers
from where2edit_tpu.models.stylegan2 import Generator
from where2edit_tpu.ops.interpolate import adaptive_avg_pool


def build_mapper(mapper_type: str, **kwargs):
    """styleclip_mapper.py:49-60 mapper factory."""
    cls = {
        "SingleMapper": latent_mappers.SingleMapper,
        "LevelsMapper": latent_mappers.LevelsMapper,
        "FullStyleSpaceMapper": latent_mappers.FullStyleSpaceMapper,
        "WithoutToRGBStyleSpaceMapper": latent_mappers.WithoutToRGBStyleSpaceMapper,
    }[mapper_type]
    accepted = ("no_coarse_mapper", "no_medium_mapper", "no_fine_mapper") \
        if mapper_type == "LevelsMapper" else ()
    return cls(**{k: v for k, v in kwargs.items() if k in accepted})


class StyleCLIPMapper:
    def __init__(self, *, mapper, mapper_params, generator: Generator,
                 generator_vars, latent_avg: Optional[jnp.ndarray] = None,
                 work_in_stylespace: bool = False):
        self.mapper = mapper
        self.mapper_params = mapper_params
        self.decoder = generator
        self.decoder_vars = generator_vars
        self.latent_avg = latent_avg
        self.work_in_stylespace = work_in_stylespace
        self._edit = jax.jit(self._edit_impl)

    def _edit_impl(self, w):
        """coach.py:83-89: w_hat = w + 0.1·mapper(w); decode."""
        if self.work_in_stylespace:
            delta = self.mapper.apply({"params": self.mapper_params}, w)
            w_hat = [c + 0.1 * d for c, d in zip(w, delta)]
            out = self.decoder.apply(self.decoder_vars, w_hat,
                                     input_is_stylespace=True,
                                     randomize_noise=False,
                                     return_latents=True)
        else:
            w_hat = w + 0.1 * self.mapper.apply(
                {"params": self.mapper_params}, w)
            out = self.decoder.apply(self.decoder_vars, [w_hat],
                                     input_is_latent=True,
                                     randomize_noise=False,
                                     return_latents=True)
        return out.image, w_hat

    def edit(self, w):
        return self._edit(w)

    def face_pool(self, images: jnp.ndarray) -> jnp.ndarray:
        return adaptive_avg_pool(images, 256)
