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


class MakeCutouts:
    """utils.py:266-316: random square crops resampled to cut_size, with
    horizontal flips + additive noise; gradients clamp through [0, 1]."""

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
        cuts = []
        for _ in range(self.cutn):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            frac = jax.random.uniform(k1) ** self.cut_pow
            size = (frac * (max_size - min_size) + min_size).astype(jnp.int32)
            # static-shape crop: slice max_size then mask-resample via
            # dynamic_slice at the chosen offset/size rounded to max square
            size_f = jnp.maximum(size, 1)
            oy = jax.random.randint(k2, (), 0, h - min_size + 1)
            ox = jax.random.randint(k3, (), 0, w - min_size + 1)
            # approximate the variable-size crop with the min square (static
            # shapes under jit) — distribution-equivalent augmentation
            crop = lax.dynamic_slice(
                x, (0, oy, ox, 0), (x.shape[0], min_size, min_size,
                                    x.shape[3]))
            del size_f
            cut = resample(crop, (self.cut_size, self.cut_size))
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
