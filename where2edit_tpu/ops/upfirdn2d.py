"""upfirdn2d: upsample → FIR filter → downsample, TPU-native.

Semantics match the reference fallback (models/stylegan2/op/upfirdn2d.py:11-60):
zero-stuff by ``up`` (a zero *after* every sample, including the last), pad by
``(pad0, pad1)`` on each spatial edge (negative pads crop), convolve with the
(true-convolution) 2D FIR ``kernel``, and keep every ``down``-th sample.

TPU-first design: instead of the reference's reshape/pad/conv pipeline we emit
a single ``lax.conv_general_dilated`` with ``lhs_dilation`` — XLA lowers this
to one fused op on the convolution hardware. ``lhs_dilation`` inserts zeros
*between* samples only, so the high padding absorbs the missing ``up - 1``
trailing zeros.  Separable (outer-product) kernels — every StyleGAN2 blur —
take two rank-1 passes, halving the MACs.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> np.ndarray:
    """2D FIR kernel from a 1D/2D spec, normalized to sum 1.

    Mirrors models/stylegan2/model.py:20-28. Returns a *host* array: FIR taps
    are static data, so separability can be decided at trace time.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return k


def _depthwise_conv(x, kern2d, *, strides, padding, lhs_dilation):
    """Depthwise conv (same kernel for every channel), NHWC."""
    c = x.shape[-1]
    # rhs (kh, kw, 1, C): one filter per channel (feature_group_count=C).
    rhs = jnp.broadcast_to(kern2d[:, :, None, None], (*kern2d.shape, 1, c))
    rhs = rhs.astype(x.dtype)
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _is_separable(kernel: np.ndarray) -> bool:
    if kernel.ndim != 2:
        return False
    if not np.all(np.isfinite(kernel)):
        return False
    # rank-1 test via SVD on the tiny (kh, kw) matrix
    s = np.linalg.svd(kernel, compute_uv=False)
    return bool(s.shape[0] < 2 or s[1] <= 1e-6 * max(s[0], 1e-30))


def upfirdn2d(x: jnp.ndarray, kernel, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """Apply upfirdn to an NHWC tensor.

    Args:
      x: (N, H, W, C).
      kernel: (kh, kw) *static* FIR filter — numpy or concrete jax array
        (true convolution — flipped internally, since XLA convs are
        cross-correlations).
      up / down: integer resampling factors (applied to both spatial dims).
      pad: (pad0, pad1) applied to both spatial dims; may be negative.
    Returns:
      (N, H', W', C) with H' = (H*up + pad0 + pad1 - kh)//down + 1.
    """
    kernel = np.asarray(kernel, dtype=np.float32)
    pad0, pad1 = pad
    kh, kw = kernel.shape
    # torch pads the *post-upsample* signal which has `up-1` trailing zeros
    # beyond what lhs_dilation produces: fold them into the high padding.
    padding = ((pad0, pad1 + up - 1), (pad0, pad1 + up - 1))
    flipped = jnp.asarray(kernel[::-1, ::-1].copy())

    if _is_separable(kernel) and kh > 1 and kw > 1:
        # kernel = outer(u, v); factor via the dominant singular vectors.
        k = np.asarray(kernel, dtype=np.float64)
        uu, ss, vv = np.linalg.svd(k)
        kcol = uu[:, 0] * np.sqrt(ss[0])   # (kh,)
        krow = vv[0, :] * np.sqrt(ss[0])   # (kw,)
        if kcol.sum() < 0:  # normalize sign so both factors are non-negative
            kcol, krow = -kcol, -krow
        kcol = jnp.asarray(kcol[::-1].copy(), dtype=jnp.float32)
        krow = jnp.asarray(krow[::-1].copy(), dtype=jnp.float32)
        out = _depthwise_conv(
            x, kcol[:, None],
            strides=(down, 1), padding=(padding[0], (0, 0)),
            lhs_dilation=(up, 1),
        )
        out = _depthwise_conv(
            out, krow[None, :],
            strides=(1, down), padding=((0, 0), padding[1]),
            lhs_dilation=(1, up),
        )
        return out

    return _depthwise_conv(
        x, flipped, strides=(down, down), padding=padding,
        lhs_dilation=(up, up),
    )
