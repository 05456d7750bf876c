"""SSIM (Wang et al. 2004 defaults: 11x11 gaussian window, sigma 1.5,
K1=0.01, K2=0.03). Used for the fp32-vs-bf16 policy check and the
SSIM-vs-reference parity target (BASELINE.md)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_window(ksize: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    return np.outer(k, k).astype(np.float32)


def _filter(x, win):
    c = x.shape[-1]
    rhs = jnp.broadcast_to(jnp.asarray(win)[:, :, None, None],
                           (*win.shape, 1, c))
    return lax.conv_general_dilated(
        x, rhs.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Mean SSIM over an NHWC batch (generator range [-1,1] → data_range 2)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = _gaussian_window()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter(a, win)
    mu_b = _filter(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = _filter(a * a, win) - mu_aa
    sig_b = _filter(b * b, win) - mu_bb
    sig_ab = _filter(a * b, win) - mu_ab
    num = (2 * mu_ab + c1) * (2 * sig_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sig_a + sig_b + c2)
    return jnp.mean(num / den)
