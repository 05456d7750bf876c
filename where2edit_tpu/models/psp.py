"""pSp composite: encoder + StyleGAN2 decoder + face pool.

Reference: models/psp.py:25-107. Functional binding of converted modules —
the checkpoint loader splits 'encoder.'/'decoder.' prefixes exactly like
``get_keys`` (models/psp.py:17-21).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.convert.irse import convert_encoder_params
from where2edit_tpu.convert.stylegan2 import convert_generator_params
from where2edit_tpu.models.encoders import (
    BackboneEncoderUsingLastLayerIntoW,
    Encoder4Editing,
    GradualStyleEncoder,
)
from where2edit_tpu.models.stylegan2 import Generator
from where2edit_tpu.ops.interpolate import adaptive_avg_pool

ENCODER_TYPES = {
    "GradualStyleEncoder": (GradualStyleEncoder, "gradual"),
    "Encoder4Editing": (Encoder4Editing, "e4e"),
    "SingleStyleCodeEncoder": (BackboneEncoderUsingLastLayerIntoW, "w"),
}


def get_keys(d: dict, name: str) -> dict:
    if "state_dict" in d:
        d = d["state_dict"]
    return {k[len(name) + 1:]: v for k, v in d.items()
            if k[: len(name)] == name}


class PSp:
    def __init__(self, encoder, encoder_vars, generator, generator_vars,
                 latent_avg: Optional[jnp.ndarray] = None,
                 start_from_latent_avg: bool = True):
        self.encoder = encoder
        self.encoder_vars = encoder_vars
        self.decoder = generator
        self.decoder_vars = generator_vars
        self.latent_avg = latent_avg
        self.start_from_latent_avg = start_from_latent_avg
        self._encode = jax.jit(lambda v, x: encoder.apply(v, x))

    @classmethod
    def from_torch_checkpoint(cls, ckpt: dict, *, stylegan_size: int = 1024,
                              encoder_type: str = "Encoder4Editing"):
        """Load a pSp/e4e torch checkpoint dict (models/psp.py:48-62)."""
        enc_cls, kind = ENCODER_TYPES[encoder_type]
        encoder = enc_cls(stylegan_size=stylegan_size)
        enc_vars = jax.tree.map(jnp.asarray, convert_encoder_params(
            get_keys(ckpt, "encoder"), stylegan_size=stylegan_size, kind=kind))
        generator = Generator(size=stylegan_size)
        gen_vars = jax.tree.map(jnp.asarray, convert_generator_params(
            get_keys(ckpt, "decoder"), stylegan_size))
        latent_avg = ckpt.get("latent_avg")
        if latent_avg is not None:
            latent_avg = jnp.asarray(np.asarray(latent_avg, dtype=np.float32))
        return cls(encoder, enc_vars, generator, gen_vars, latent_avg)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 256, 256, 3) normalized to [-1,1] → W+ codes."""
        codes = self._encode(self.encoder_vars, x)
        if self.start_from_latent_avg and self.latent_avg is not None:
            avg = self.latent_avg
            if avg.ndim == 2:
                codes = codes + avg[None]
            else:
                codes = codes + avg
        return codes

    def __call__(self, x, *, resize: bool = True, latent_mask=None,
                 input_code: bool = False, inject_latent=None,
                 return_latents: bool = False, alpha=None,
                 randomize_noise: bool = False):
        codes = x if input_code else self.encode(x)
        if latent_mask is not None:
            for i in latent_mask:
                if inject_latent is not None:
                    if alpha is not None:
                        codes = codes.at[:, i].set(
                            alpha * inject_latent[:, i]
                            + (1 - alpha) * codes[:, i])
                    else:
                        codes = codes.at[:, i].set(inject_latent[:, i])
                else:
                    codes = codes.at[:, i].set(0.0)
        out = self.decoder.apply(
            self.decoder_vars, [codes], input_is_latent=not input_code,
            randomize_noise=randomize_noise, return_latents=True)
        images = out.image
        if resize:
            images = adaptive_avg_pool(images, 256)
        if return_latents:
            return images, out.latent, out.style_vector
        return images
