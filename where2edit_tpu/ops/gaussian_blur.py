"""Gaussian blur matching torchvision.transforms.functional.gaussian_blur.

Used on the final attention map (attention/run_attention.py:884,
show_demo/utils_demo.py:155): kernel_size=5, sigma derived from torchvision's
default ``sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8`` with reflect padding.
Separable two-pass depthwise conv (NHWC).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_kernel1d(ksize: int, sigma: float | None) -> np.ndarray:
    if sigma is None:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float32) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(x: jnp.ndarray, ksize: int = 5, sigma: float | None = None) -> jnp.ndarray:
    """Blur NHWC input with reflect padding (torchvision semantics)."""
    k1 = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    c = x.shape[-1]
    pad = ksize // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def dw(inp, kern, axis):
        if axis == 0:
            rhs = jnp.broadcast_to(kern[:, None, None, None], (ksize, 1, 1, c))
        else:
            rhs = jnp.broadcast_to(kern[None, :, None, None], (1, ksize, 1, c))
        return lax.conv_general_dilated(
            inp, rhs.astype(inp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    out = dw(xp, k1, 0)
    out = dw(out, k1, 1)
    return out
