"""VQGAN-CLIP-style cutouts + lanczos resampling (reference utils.py:266-372).

The reference constructs MakeCutouts at run_attention.py:1008 (unused by the
live loss) — implemented here for full API coverage. The lanczos ``resample``
and ``ClampWithGrad`` match utils.py:319-372; the torchvision-based photo
augmentations are replaced by JAX-native flips + gaussian noise (the parts
exercised by the reference's defaults that don't require torchvision).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from where2edit_tpu.ops.interpolate import interpolate_bilinear


def _sinc(x):
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(x != 0, np.sin(math.pi * x) / (math.pi * x), 1.0)


def _lanczos_kernel(ratio: float, a: int = 2) -> np.ndarray:
    """utils.py:319-336: lanczos taps over the ramp for one axis."""
    n = math.ceil(a / ratio + 1)
    out = np.arange(n, dtype=np.float64) * ratio
    taps = np.concatenate([-out[1:][::-1], out])[1:-1]
    k = np.where(np.logical_and(-a < taps, taps < a),
                 _sinc(taps) * _sinc(taps / a), 0.0)
    return (k / k.sum()).astype(np.float32)


def resample(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Lanczos-prefiltered downscale then bicubic-ish resize
    (utils.py:339-358). x: NHWC. Uses bilinear for the final interpolation
    (the prefilter dominates the anti-aliasing quality)."""
    _, h, w, c = x.shape
    dh, dw = size

    def dw_conv(inp, k1, axis):
        ksize = k1.shape[0]
        pad = (ksize - 1) // 2
        if axis == 0:
            inp = jnp.pad(inp, ((0, 0), (pad, pad), (0, 0), (0, 0)),
                          mode="reflect")
            rhs = jnp.broadcast_to(jnp.asarray(k1)[:, None, None, None],
                                   (ksize, 1, 1, c))
        else:
            inp = jnp.pad(inp, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                          mode="reflect")
            rhs = jnp.broadcast_to(jnp.asarray(k1)[None, :, None, None],
                                   (1, ksize, 1, c))
        return lax.conv_general_dilated(
            inp, rhs.astype(inp.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    if dh < h:
        x = dw_conv(x, _lanczos_kernel(dh / h), 0)
    if dw < w:
        x = dw_conv(x, _lanczos_kernel(dw / w), 1)
    return interpolate_bilinear(x, size, align_corners=True)


@jax.custom_vjp
def clamp_with_grad(x, lo: float, hi: float):
    return jnp.clip(x, lo, hi)


def _cwg_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), (x, lo, hi)


def _cwg_bwd(res, g):
    x, lo, hi = res
    # utils.py:361-372: pass the grad where it points back inside the range
    keep = g * (x - jnp.clip(x, lo, hi)) >= 0
    return (jnp.where(keep, g, 0.0), None, None)


clamp_with_grad.defvjp(_cwg_fwd, _cwg_bwd)


def masks_to_boxes(masks: jnp.ndarray, threshold: float = 0.7,
                   margin_div: int = 16) -> jnp.ndarray:
    """Bounding boxes around masks with the reference's margin/fallback
    semantics (utils.py:394-431). masks: (N, H, W) or (N, 1, H, W)-like
    NHWC (N, H, W, 1). Returns (N, 4) int32 (x1, y1, x2, y2)."""
    if masks.ndim == 4:
        masks = masks[..., 0]
    n, h, w = masks.shape
    hot = masks > threshold
    rows = jnp.any(hot, axis=2)   # (N, H)
    cols = jnp.any(hot, axis=1)   # (N, W)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)

    def bounds(any_axis, idx, size):
        has = jnp.any(any_axis, axis=1)
        lo = jnp.min(jnp.where(any_axis, idx, size), axis=1)
        hi = jnp.max(jnp.where(any_axis, idx, -1), axis=1)
        lo = jnp.maximum(lo - size // margin_div, 0)
        hi = jnp.minimum(hi + size // margin_div, size - 1)
        lo = jnp.where(has, lo, 0)
        hi = jnp.where(has, hi, size - 1)
        return lo, hi

    x1, x2 = bounds(rows, ridx[None, :], h)
    y1, y2 = bounds(cols, cidx[None, :], w)
    return jnp.stack([x1, y1, x2, y2], axis=1).astype(jnp.int32)


def crop_resize_bilinear(x: jnp.ndarray, oy, ox, size, out_size: int
                         ) -> jnp.ndarray:
    """Dynamic square crop (oy, ox, size, size) resized to out_size², with
    static output shapes (jit-safe): separable bilinear sampling at traced
    coordinates. ``oy``/``ox``/``size`` may be traced scalars."""
    _, h, w, _ = x.shape
    i = jnp.arange(out_size, dtype=jnp.float32)

    def axis_samples(off, extent, limit):
        s = off + size * (i + 0.5) / out_size - 0.5
        lo = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, limit - 1)
        hi = jnp.clip(lo + 1, 0, limit - 1)
        frac = jnp.clip(s - lo, 0.0, 1.0)
        return lo, hi, frac.astype(x.dtype)

    y0, y1, fy = axis_samples(oy, size, h)
    x0, x1, fx = axis_samples(ox, size, w)
    rows = (jnp.take(x, y0, axis=1) * (1 - fy)[None, :, None, None]
            + jnp.take(x, y1, axis=1) * fy[None, :, None, None])
    return (jnp.take(rows, x0, axis=2) * (1 - fx)[None, None, :, None]
            + jnp.take(rows, x1, axis=2) * fx[None, None, :, None])


class MakeCutouts:
    """utils.py:266-316: random VARIABLE-size square crops (size ~
    rand()^cut_pow scaled to [min_size, max_size]) resampled to cut_size,
    with horizontal flips + additive noise; gradients clamp through [0, 1].

    Deviation (documented): the reference lanczos-prefilters each crop before
    resizing (utils.py:339-358 ``resample``); with traced crop sizes the
    prefilter width would be dynamic, so crops are sampled bilinearly at
    traced coordinates instead (``crop_resize_bilinear``), with a fixed 2x
    average-pool prefilter selected per cut whenever the sampled crop is
    more than 2x the cut size (bounds the worst-case aliasing of large
    crops; both branches have static shapes so the select is jit-safe). The
    static-size ``resample`` keeps the exact lanczos path for non-jit
    callers."""

    def __init__(self, cut_size: int, cutn: int, cut_pow: float = 1.0,
                 noise_fac: float = 0.1):
        self.cut_size = cut_size
        self.cutn = cutn
        self.cut_pow = cut_pow
        self.noise_fac = noise_fac

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        _, h, w, _ = x.shape
        max_size = min(h, w)
        min_size = min(h, w, self.cut_size)
        # fixed 2x antialias level (static shapes): crops larger than
        # 2*cut_size sample from here with halved coordinates
        x_half = None
        if max_size > 2 * self.cut_size and h % 2 == 0 and w % 2 == 0:
            x_half = 0.25 * (x[:, ::2, ::2] + x[:, 1::2, ::2]
                             + x[:, ::2, 1::2] + x[:, 1::2, 1::2])
        cuts = []
        for _ in range(self.cutn):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            frac = jax.random.uniform(k1) ** self.cut_pow
            size = jnp.floor(frac * (max_size - min_size) + min_size)
            # offsets uniform over [0, side - size] (utils.py:302-303);
            # sampled continuously since `size` is traced
            oy = jnp.floor(jax.random.uniform(k2) * (h - size + 1))
            ox = jnp.floor(jax.random.uniform(k3) * (w - size + 1))
            cut = crop_resize_bilinear(x, oy, ox, size,
                                       self.cut_size)
            if x_half is not None:
                cut_aa = crop_resize_bilinear(x_half, oy / 2, ox / 2,
                                              size / 2, self.cut_size)
                cut = jnp.where(size > 2 * self.cut_size, cut_aa, cut)
            flip = jax.random.bernoulli(k4)
            cut = jnp.where(flip, cut[:, :, ::-1, :], cut)
            cuts.append(cut)
        out = jnp.concatenate(cuts, axis=0)
        if self.noise_fac:
            key, k1, k2 = jax.random.split(key, 3)
            facs = jax.random.uniform(k1, (out.shape[0], 1, 1, 1),
                                      maxval=self.noise_fac)
            out = out + facs * jax.random.normal(k2, out.shape)
        return clamp_with_grad(out, 0.0, 1.0)
