"""VGG16 perceptual loss (criteria/perceptual_loss.py:7-65).

Bug-compatible: the reference's ``normalize_batch`` is a no-op (its imagenet
normalization is commented out, perceptual_loss.py:60-65), so [-1, 1] images
hit VGG unnormalized. Loss is MSE on relu2_2 only.
"""

from __future__ import annotations

import jax.numpy as jnp

from where2edit_tpu.losses.clip_loss import clip_image_resize


class PerceptualLoss:
    def __init__(self, vgg, vgg_variables, stylegan_size: int = 1024):
        self.vgg = vgg
        self.variables = vgg_variables
        self.stylegan_size = stylegan_size

    def apply(self, variables, image1: jnp.ndarray,
              image2: jnp.ndarray) -> jnp.ndarray:
        """Pure form: VGG variables explicit so outer jitted steps can pass
        them as arguments (weights closed over become HLO constants — see
        losses/clip_loss.py docstring)."""
        x1 = clip_image_resize(image1, self.stylegan_size)
        x2 = clip_image_resize(image2, self.stylegan_size)
        f1 = self.vgg.apply(variables, x1)
        f2 = self.vgg.apply(variables, x2)
        return jnp.mean(jnp.square(f1.relu2_2 - f2.relu2_2))

    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray) -> jnp.ndarray:
        return self.apply(self.variables, image1, image2)
