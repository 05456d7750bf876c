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

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _resize_matrix(src: int, up: int, k: int):
    """Row-stochastic (out, src) matrix for repeat-upsample(up) → avgpool(k).

    W[o, i] = |[k·o, k·o+k) ∩ [up·i, up·i+up)| / k — each output pixel
    averages ≤ ceil(k/up)+1 input pixels with these exact weights.
    """
    out = src * up // k
    W = np.zeros((out, src), np.float32)
    for o in range(out):
        lo, hi = k * o, k * o + k
        for i in range(lo // up, min((hi - 1) // up + 1, src)):
            W[o, i] = (min(hi, up * i + up) - max(lo, up * i)) / k
    return W


def clip_image_resize(image: jnp.ndarray, stylegan_size: int) -> jnp.ndarray:
    """(B, S, S, 3) → (B, 224, 224, 3): the reference's upsample(×7) +
    avgpool(S//32) resize trick (clip_loss.py:11-15), computed as one exact
    separable banded resampling. Materializing the ×7 upsample literally
    (7168² × 3ch at 1024px) pads to ~26 GB under the TPU's (8,128) tiled
    layout — the weight-matrix form is the identical linear map without the
    intermediate."""
    if stylegan_size < 32:  # degenerate small sizes: k = S//32 == 0
        from where2edit_tpu.ops.interpolate import upsample_repeat  # noqa: PLC0415

        return upsample_repeat(image, 224 // image.shape[1])
    W = jnp.asarray(_resize_matrix(image.shape[1], 7, stylegan_size // 32),
                    image.dtype)
    x = jnp.einsum("oh,bhwc->bowc", W, image)
    return jnp.einsum("pw,bowc->bopc", W, x)


class CLIPLoss:
    """loss = 1 - logits_per_image/100 (criteria/clip_loss.py:15-17).

    The jitted paths take the CLIP variables as ARGUMENTS (never close over
    them): weights closed over become HLO constants, and this environment's
    compile service takes ~30 min on constant-laden graphs vs seconds on
    the identical graph with parameter inputs. Callers embedding these
    encoders in a larger jitted step must thread ``variables`` through that
    step's arguments too (see ``apply_encode_image``).
    """

    def __init__(self, clip_model, clip_variables, stylegan_size: int = 1024):
        self.model = clip_model
        self.variables = clip_variables
        self.stylegan_size = stylegan_size
        import jax  # noqa: PLC0415

        self._encode_image = jax.jit(lambda v, x: clip_model.apply(
            v, x, method=clip_model.encode_image))
        self._encode_text = jax.jit(lambda v, t: clip_model.apply(
            v, t, method=clip_model.encode_text))

    # ---- pure forms (variables explicit; safe inside outer jits) ----
    def apply_encode_image(self, variables, image: jnp.ndarray) -> jnp.ndarray:
        x = clip_image_resize(image, self.stylegan_size)
        return self.model.apply(variables, x, method=self.model.encode_image)

    def apply_encode_text(self, variables, tokens) -> jnp.ndarray:
        return self.model.apply(variables, tokens,
                                method=self.model.encode_text)

    # ---- convenience forms (held variables, standalone jit) ----
    def encode_image(self, image: jnp.ndarray) -> jnp.ndarray:
        """image: raw generator output (B, S, S, 3) in [-1, 1]."""
        x = clip_image_resize(image, self.stylegan_size)
        return self._encode_image(self.variables, x)

    def encode_text(self, tokens) -> jnp.ndarray:
        return self._encode_text(self.variables, tokens)

    def __call__(self, image: jnp.ndarray, tokens) -> jnp.ndarray:
        x = clip_image_resize(image, self.stylegan_size)
        logits_per_image, _ = self.model.apply(self.variables, x, tokens)
        return 1.0 - logits_per_image / 100.0
