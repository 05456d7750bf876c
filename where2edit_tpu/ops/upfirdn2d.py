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


def _axis_upfirdn_shift_add(x: jnp.ndarray, taps: np.ndarray, axis: int,
                            up: int, down: int, pad0: int, pad1: int
                            ) -> jnp.ndarray:
    """1-D upfirdn along a spatial axis as weighted shift-adds.

    Depthwise (feature_group_count=C) convs lower terribly on the TPU conv
    unit; for the tiny FIR taps here a polyphase sum of strided slices is a
    pure-VPU bandwidth-bound op that XLA fuses into one loop.
    Semantics identical to the conv path (torch upfirdn):
      y[j] = Σ_t k[t] · xpad_up[j·down + t]
    where xpad_up is the zero-stuffed (×up, incl. trailing zeros) then
    (pad0, pad1)-padded signal.
    """
    k = len(taps)
    in_size = x.shape[axis]
    total = in_size * up + pad0 + pad1
    out_size = (total - k) // down + 1

    def slice_axis(arr, start, size, stride=1):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(start, start + (size - 1) * stride + 1, stride)
        return arr[tuple(idx)]

    def pad_axis(arr, lo, hi):
        if lo == 0 and hi == 0:
            return arr
        cfg = [(0, 0)] * arr.ndim
        # negative pads crop
        if lo < 0 or hi < 0:
            size = arr.shape[axis]
            arr = slice_axis(arr, max(-lo, 0), size - max(-lo, 0) - max(-hi, 0))
            lo, hi = max(lo, 0), max(hi, 0)
            cfg = [(0, 0)] * arr.ndim
        cfg[axis] = (lo, hi)
        return jnp.pad(arr, cfg)

    if up == 1:
        xp = pad_axis(x, pad0, pad1)
        acc = None
        for t in range(k):
            term = float(taps[t]) * slice_axis(xp, t, out_size, down)
            acc = term if acc is None else acc + term
        return acc

    # up > 1: polyphase. Output index j reads stuffed position j·down + t;
    # a stuffed position p maps to x[p // up] iff p % up == 0 (within range).
    # Compute each output phase r = j mod up ... but j·down couples phases;
    # handle via per-phase accumulation over output strides of `up` when
    # down == 1 (the only up>1 case in StyleGAN: up=2, down=1).
    assert down == 1, "up>1 with down>1 not used by this framework"
    phases = []
    for r in range(up):
        # outputs j ≡ r (mod up): stuffed pos = j + t ; nonzero when
        # (j + t - pad0) % up == 0 → t ≡ (pad0 - r) (mod up)
        acc = None
        n_phase = (out_size - r + up - 1) // up
        for t in range(k):
            if (r + t - pad0) % up != 0:
                continue
            # x index for output j = r + up·m is m + base
            base = (r + t - pad0) // up
            lo_pad = max(-base, 0)
            hi_pad = max(base + n_phase - x.shape[axis], 0)
            xp = pad_axis(x, lo_pad, hi_pad)
            seg = slice_axis(xp, base + lo_pad, n_phase)
            term = float(taps[t]) * seg
            acc = term if acc is None else acc + term
        if acc is None:
            shape = list(x.shape)
            shape[axis] = n_phase
            acc = jnp.zeros(shape, x.dtype)
        phases.append(acc)

    # interleave phases: pad phases to equal length then stack along a new
    # axis right after `axis` and reshape
    max_len = max(p.shape[axis] for p in phases)
    padded = []
    for p in phases:
        deficit = max_len - p.shape[axis]
        padded.append(pad_axis(p, 0, deficit))
    stacked = jnp.stack(padded, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = max_len * up
    out = stacked.reshape(new_shape)
    return slice_axis(out, 0, out_size)


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

    import os
    impl_env = os.environ.get("W2E_UPFIRDN_IMPL")
    impl = impl_env or "shift_add"

    # tiny channel counts (the RGB skip chain): one DENSE conv with
    # lhs_dilation. The shift-add path's phase interleave lowers to
    # stack+reshape layout copies that dominate the skip chain's cost
    # (profiled: ~25% of a 1024² synthesis step was these copies); a dense
    # (kh,kw,C,C) diagonal kernel is one implicit-dilation conv pass with
    # no materialized intermediates, and at C=3 the padded MACs are noise.
    # Auto-selected only when W2E_UPFIRDN_IMPL is unset, so an explicit
    # `shift_add`/`conv` setting always gets the named implementation;
    # `dense` forces this path regardless of channel count.
    c = x.shape[-1]
    if ((impl == "dense" or (impl_env is None and c <= 8))
            and up >= 1 and down == 1):
        rhs = flipped[:, :, None, None] * jnp.eye(c, dtype=x.dtype)
        return lax.conv_general_dilated(
            x, rhs.astype(x.dtype), window_strides=(1, 1), padding=padding,
            lhs_dilation=(up, up),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if (impl == "shift_add" and _is_separable(kernel) and kh > 1 and kw > 1
            and (down == 1 or up == 1)):
        # kernel = outer(u, v); factor via the dominant singular vectors.
        k = np.asarray(kernel, dtype=np.float64)
        uu, ss, vv = np.linalg.svd(k)
        kcol = uu[:, 0] * np.sqrt(ss[0])   # (kh,)
        krow = vv[0, :] * np.sqrt(ss[0])   # (kw,)
        if kcol.sum() < 0:  # normalize sign so both factors are non-negative
            kcol, krow = -kcol, -krow
        # flipped taps = true convolution (y[j] = Σ k[t]·x_up[j+t] uses the
        # cross-correlation orientation, so flip once here)
        kcol = kcol[::-1].astype(np.float32)
        krow = krow[::-1].astype(np.float32)
        # NB: unlike the lhs_dilation path, the shift-add model already
        # includes the trailing (up-1) stuffed zeros, so pad1 passes through.
        out = _axis_upfirdn_shift_add(x, kcol, 1, up, down, pad0, pad1)
        out = _axis_upfirdn_shift_add(out, krow, 2, up, down, pad0, pad1)
        return out

    return _depthwise_conv(
        x, flipped, strides=(down, down), padding=padding,
        lhs_dilation=(up, up),
    )
