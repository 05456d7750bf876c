"""CLIP similarity loss.

Reference: criteria/clip_loss.py:6-17. Two bug-compatible quirks preserved
(the parity targets depend on them):

  * the resize "trick": nearest ×7 upsample then avg-pool(stylegan_size//32)
    — NOT a proper 224 resize (1024→7168→224).
  * images enter CLIP in generator range [-1, 1] *without* CLIP mean/std
    normalization (run_attention.py:1163-1164 — the Normalize transform at
    :1009 is only applied to the unused cutout path).
"""

from __future__ import annotations

import jax.numpy as jnp

from where2edit_tpu.ops.interpolate import avg_pool, upsample_repeat


def clip_image_resize(image: jnp.ndarray, stylegan_size: int) -> jnp.ndarray:
    """(B, S, S, 3) → (B, 224, 224, 3) via upsample(×7) + avgpool(S//32)."""
    return avg_pool(upsample_repeat(image, 7), stylegan_size // 32)


class CLIPLoss:
    """loss = 1 - logits_per_image/100 (criteria/clip_loss.py:15-17)."""

    def __init__(self, clip_model, clip_variables, stylegan_size: int = 1024):
        self.model = clip_model
        self.variables = clip_variables
        self.stylegan_size = stylegan_size
        import jax  # noqa: PLC0415

        self._encode_image = jax.jit(lambda x: clip_model.apply(
            clip_variables, x, method=clip_model.encode_image))
        self._encode_text = jax.jit(lambda t: clip_model.apply(
            clip_variables, t, method=clip_model.encode_text))

    def encode_image(self, image: jnp.ndarray) -> jnp.ndarray:
        """image: raw generator output (B, S, S, 3) in [-1, 1]."""
        x = clip_image_resize(image, self.stylegan_size)
        return self._encode_image(x)

    def encode_text(self, tokens) -> jnp.ndarray:
        return self._encode_text(tokens)

    def __call__(self, image: jnp.ndarray, tokens) -> jnp.ndarray:
        x = clip_image_resize(image, self.stylegan_size)
        logits_per_image, _ = self.model.apply(self.variables, x, tokens)
        return 1.0 - logits_per_image / 100.0
