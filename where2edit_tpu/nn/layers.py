"""StyleGAN2 building blocks, TPU-native.

Numerics match models/stylegan2/model.py (file:line cites on each class), but
the implementation is JAX/NHWC-idiomatic:

* ``ModulatedConv2d`` (model.py:179-276) drops the torch ``groups=batch``
  per-sample-weight trick — the wrong idiom for the MXU — in favor of the
  mathematically identical *modulate-activations / demodulate-outputs*
  formulation: ``conv(x, w·s) == demod ⊙ conv(x·s, w)`` because the style
  scale is per-input-channel and demod per-output-channel. One shared-weight
  conv over the whole batch keeps the MXU busy with large batched contractions.
* Weight layouts: conv kernels HWIO, linear weights (in, out). The torch
  converters in ``where2edit_tpu.convert`` transpose at load time.
* Runtime equalized-LR scaling (·1/sqrt(fan_in)) is kept at runtime exactly as
  the reference so converted checkpoints drop in unchanged.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn
from jax import lax

from where2edit_tpu.ops.fused_act import fused_leaky_relu
from where2edit_tpu.ops.upfirdn2d import make_kernel, upfirdn2d


def pixel_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x * rsqrt(mean(x^2, axis) + 1e-8)  (model.py:11-17)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + 1e-8)


class PixelNorm(fnn.Module):
    """Parameter-free; ``axis`` defaults to the feature (last) axis."""
    axis: int = -1

    def __call__(self, x):
        return pixel_norm(x, self.axis)


class EqualLinear(fnn.Module):
    """Equalized-LR linear (model.py:130-164).

    weight stored (in_dim, out_dim), scaled at runtime by
    (1/sqrt(in_dim))·lr_mul; bias by lr_mul. ``activation='fused_lrelu'``
    applies bias inside the fused leaky-relu (+sqrt 2 gain).
    """
    in_dim: int
    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: str | None = None
    dtype: jnp.dtype | None = None

    @fnn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (self.in_dim, self.out_dim),
        )
        b = (
            self.param("bias", fnn.initializers.constant(self.bias_init), (self.out_dim,))
            if self.use_bias
            else None
        )
        scale = (1.0 / math.sqrt(self.in_dim)) * self.lr_mul
        dtype = self.dtype or x.dtype
        out = jnp.dot(x.astype(dtype), (w * scale).astype(dtype),
                      preferred_element_type=dtype)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, None if b is None else b * self.lr_mul)
        if b is not None:
            out = out + (b * self.lr_mul).astype(out.dtype)
        return out


class ScaledLeakyReLU(fnn.Module):
    """leaky_relu(x)·sqrt(2) (model.py:167-176)."""
    negative_slope: float = 0.2

    def __call__(self, x):
        return jnp.where(x >= 0, x, x * self.negative_slope) * math.sqrt(2.0)


class EqualConv2d(fnn.Module):
    """Equalized-LR conv, NHWC/HWIO (model.py:92-127)."""
    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init: float = 0.0

    @fnn.compact
    def __call__(self, x, s2d: bool = False, s2d_down=None):
        """``s2d``: consume AND produce space-to-depth layout (weights
        transformed exactly; k ∈ {1, 3}). ``s2d_down``: (blur_2d, off) —
        consume s2d, apply the merged blur+stride-2 kernel as a stride-1
        SAME conv, produce PIXEL layout at half resolution (the
        discriminator's downsample from an s2d octave)."""
        k = self.kernel_size
        w = self.param(
            "weight", fnn.initializers.normal(1.0),
            (k, k, self.in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(self.in_channel * k * k)
        if s2d_down is not None:
            blur_2d, off = s2d_down
            v = _merge_blur_into_downsample_weight(w * scale, blur_2d)
            kern = _downconv_weight_to_s2d(v, off)
            out = lax.conv_general_dilated(
                x, kern.astype(x.dtype), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif s2d:
            kern = (_conv1_weight_to_s2d(w * scale) if k == 1
                    else _conv3_weight_to_s2d(w * scale))
            pad = k // 2
            out = lax.conv_general_dilated(
                x, kern.astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            out = lax.conv_general_dilated(
                x, (w * scale).astype(x.dtype),
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", fnn.initializers.constant(self.bias_init),
                           (self.out_channel,))
            if s2d:
                b = jnp.tile(b, 4)  # phase-major block order
            out = out + b.astype(out.dtype)
        return out


class Blur(fnn.Module):
    """upfirdn2d FIR blur (model.py:73-89)."""
    kernel: Sequence[int] = (1, 3, 3, 1)
    pad: tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @fnn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel)
        if self.upsample_factor > 1:
            k = k * (self.upsample_factor ** 2)
        return upfirdn2d(x, k, pad=tuple(self.pad))


class Upsample(fnn.Module):
    """FIR upsample x2 (model.py:31-49)."""
    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @fnn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel) * (self.factor ** 2)
        p = k.shape[0] - self.factor
        pad = ((p + 1) // 2 + self.factor - 1, p // 2)
        return upfirdn2d(x, k, up=self.factor, down=1, pad=pad)


class Downsample(fnn.Module):
    """FIR downsample x2 (model.py:52-70)."""
    kernel: Sequence[int] = (1, 3, 3, 1)
    factor: int = 2

    @fnn.compact
    def __call__(self, x):
        k = make_kernel(self.kernel)
        p = k.shape[0] - self.factor
        pad = ((p + 1) // 2, p // 2)
        return upfirdn2d(x, k, up=1, down=self.factor, pad=pad)


def _conv_transpose2x(x: jnp.ndarray, w_hwio: jnp.ndarray) -> jnp.ndarray:
    """torch conv_transpose2d(stride=2, padding=0) as a dilated conv.

    out = crosscorr(zero-dilate(x, 2), spatial-flip(w)), full padding.
    """
    k = w_hwio.shape[0]
    w = jnp.flip(w_hwio, (0, 1))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _merge_blur_into_transpose_weight(w_hwio: jnp.ndarray, blur_2d: np.ndarray,
                                      pad0: int) -> jnp.ndarray:
    """Compose blur(convT2(x, W)) into a single convT2 kernel.

    z[j] = Σ_t k̃[t]·y[j - pad0 + t] with y = convT2(x, W) gives
    z[j] = Σ_q x[q]·V[j - 2q] where V[s] = Σ_t k̃[t]·W[s + t - pad0]
    (k̃ = flipped blur taps — upfirdn performs true convolution). The merged
    kernel spans k + len(blur) - 1 taps; the caller crops the full convT
    output by (len(blur) - 1 - pad0) on the low side.

    One conv over the big activations instead of two — the blur's full
    read+write of the largest tensors in the network disappears.
    """
    kb = blur_2d.shape[0]
    k = w_hwio.shape[0]
    kf = blur_2d[::-1, ::-1]
    kk = k + kb - 1
    # V'[u] = V[u - (kb - 1 - pad0)] supported on u ∈ [0, kk)
    shift = kb - 1 - pad0
    out = jnp.zeros((kk, kk, *w_hwio.shape[2:]), w_hwio.dtype)
    del shift
    for t1 in range(kb):
        for t2 in range(kb):
            # W[wi] with blur tap t lands at u = wi + (kb - 1 - t)
            o1 = kb - 1 - t1
            o2 = kb - 1 - t2
            out = out.at[o1:o1 + k, o2:o2 + k].add(
                float(kf[t1, t2]) * w_hwio)
    return out


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(N,H,W,C) → (N,H/b,W/b,b·b·C), channel order (by, bx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    n, h, w, c4 = x.shape
    c = c4 // (block * block)
    x = x.reshape(n, h, w, block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h * block, w * block, c)


def _upconv6_weight_to_s2d(v6: jnp.ndarray) -> jnp.ndarray:
    """Merged 6-tap convT kernel (6,6,in,out) → phase conv (3,3,in,4·out).

    z[2i+a] = Σ_q x[q]·V'[2i+a+2-2q] becomes, per phase (a,b), a stride-1
    SAME conv: K_ab[r] = V'[a + 4 - 2r] (derivation in models docstring).
    Output channel order (a, b, o) matches space_to_depth.
    """
    out_c = v6.shape[3]
    phases = []
    for a in range(2):
        for b in range(2):
            taps = jnp.stack([
                jnp.stack([v6[a + 4 - 2 * r1, b + 4 - 2 * r2]
                           for r2 in range(3)], axis=0)
                for r1 in range(3)], axis=0)  # (3,3,in,out)
            phases.append(taps)
    return jnp.concatenate(phases, axis=-1)  # (3,3,in,4·out)


def _conv3_weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv (3,3,in,out) → s2d-space block conv (3,3,4·in,4·out).

    out[(2i+a)] reads x[2(i+P)+A] with u = 2P + A - a + 1 ∈ [0,3); zeros
    elsewhere. r = P + 1 is the kernel index in SAME cross-corr form.
    """
    in_c, out_c = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * in_c, 4 * out_c), w.dtype)
    for a in range(2):
        for b in range(2):
            for A in range(2):
                for B in range(2):
                    for P in range(-1, 2):
                        for Q in range(-1, 2):
                            u = 2 * P + A - a + 1
                            v = 2 * Q + B - b + 1
                            if not (0 <= u <= 2 and 0 <= v <= 2):
                                continue
                            ci = (A * 2 + B) * in_c
                            co = (a * 2 + b) * out_c
                            k = k.at[P + 1, Q + 1, ci:ci + in_c,
                                     co:co + out_c].set(w[u, v])
    return k


def _merge_blur_into_downsample_weight(w_hwio: jnp.ndarray,
                                       blur_2d: np.ndarray) -> jnp.ndarray:
    """Compose Blur(pad=(pl,pr)) → stride-2 conv into one merged kernel.

    y[m] = Σ_i kf[i]·x[m + i − pl] (upfirdn true convolution, kf = flipped
    blur) and out[o] = Σ_r w[r]·y[2o + r] give
    out[o] = Σ_u V[u]·x[2o + u − pl] with V[u] = Σ_{r+i=u} w[r]·kf[i] —
    a (k + kb − 1)-tap kernel read at stride 2. The caller's offset is the
    blur's left pad pl."""
    kb = blur_2d.shape[0]
    k = w_hwio.shape[0]
    kf = blur_2d[::-1, ::-1]
    kk = k + kb - 1
    out = jnp.zeros((kk, kk, *w_hwio.shape[2:]), w_hwio.dtype)
    for i1 in range(kb):
        for i2 in range(kb):
            out = out.at[i1:i1 + k, i2:i2 + k].add(
                float(kf[i1, i2]) * w_hwio)
    return out


def _downconv_weight_to_s2d(v: jnp.ndarray, off: int) -> jnp.ndarray:
    """Merged downsample kernel (kk,kk,in,out) → s2d-input conv
    (3,3,4·in,out), stride 1, SAME pad 1, output in PIXEL layout at half
    resolution: x[2o + u − off] = X_s2d[o + J, phase a] with
    u = 2J + a + off, J ∈ {−1,0,1}. Exact for kk ≤ 6, off ∈ {1,2} (the
    blur-4 cases k ∈ {1,3})."""
    kk = v.shape[0]
    in_c, out_c = v.shape[2], v.shape[3]
    k = jnp.zeros((3, 3, 4 * in_c, out_c), v.dtype)
    for a in range(2):
        for b in range(2):
            blk = (a * 2 + b) * in_c
            for j1 in (-1, 0, 1):
                for j2 in (-1, 0, 1):
                    u1 = 2 * j1 + a + off
                    u2 = 2 * j2 + b + off
                    if 0 <= u1 < kk and 0 <= u2 < kk:
                        k = k.at[j1 + 1, j2 + 1, blk:blk + in_c, :].set(
                            v[u1, u2])
    return k


def _conv1_weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv (1,1,in,out) → s2d block-diagonal (1,1,4·in,4·out)."""
    in_c, out_c = w.shape[2], w.shape[3]
    k = jnp.zeros((1, 1, 4 * in_c, 4 * out_c), w.dtype)
    for p in range(4):
        k = k.at[0, 0, p * in_c:(p + 1) * in_c,
                 p * out_c:(p + 1) * out_c].set(w[0, 0])
    return k


class ModulatedConv2d(fnn.Module):
    """Style-modulated, (optionally) demodulated conv (model.py:179-276).

    Returns ``(out, style)`` where style is the (B, in_channel) modulation
    vector — the framework's S-space representation (the reference carries the
    same data as (B,1,C,1,1); see editing.stylespace for adapters).
    """
    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    fuse_blur: bool = True  # compose blur into the convT kernel (exact)

    @fnn.compact
    def __call__(self, x, style, input_is_stylespace: bool = False,
                 s2d_in: bool = False, s2d_out: bool = False):
        """``s2d_in``/``s2d_out``: consume/produce space-to-depth layout
        (2x2 blocks folded into channels). Low-channel high-resolution
        octaves run 4x wider and 2x smaller spatially, which fills the MXU
        and its (8,128) layout tiles; the weight transforms are exact."""
        k = self.kernel_size
        w = self.param(
            "weight", fnn.initializers.normal(1.0),
            (k, k, self.in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(self.in_channel * k * k)

        if not input_is_stylespace:
            s = EqualLinear(self.style_dim, self.in_channel, bias_init=1.0,
                            name="modulation")(style)
        else:
            s = style.reshape(style.shape[0], self.in_channel)

        if self.demodulate:
            # demod[b,o] = rsqrt(sum_{hwi} (scale·w·s[b,i])^2 + 1e-8); fp32.
            w2 = jnp.square(scale * w.astype(jnp.float32))
            sigma = jnp.einsum(
                "hwio,bi->bo", w2, jnp.square(s.astype(jnp.float32)),
                preferred_element_type=jnp.float32,
            )
            demod = lax.rsqrt(sigma + 1e-8)

        s_act = s if not s2d_in else jnp.tile(s, (1, 4))
        x = x * (scale * s_act[:, None, None, :]).astype(x.dtype)

        if s2d_in or s2d_out:
            return self._s2d_path(x, w, demod if self.demodulate else None,
                                  s, s2d_in, s2d_out)

        if self.upsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0, pad1 = (p + 1) // 2 + factor - 1, p // 2 + 1
            # CPU's dilated-conv path has no fast 6x6 kernel; the fused form
            # is a TPU optimization (exact either way)
            use_fused = self.fuse_blur and (
                jax.default_backend() == "tpu"
                or os.environ.get("W2E_FUSE_BLUR") == "1")
            if use_fused:
                # compose the FIR blur into the transposed-conv kernel: one
                # pass over the (largest-in-network) upsampled activations
                blur2d = make_kernel(self.blur_kernel) * (factor ** 2)
                kb = blur2d.shape[0]
                w_merged = _merge_blur_into_transpose_weight(w, blur2d, pad0)
                full = _conv_transpose2x(x, w_merged)
                in_h, in_w = x.shape[1], x.shape[2]
                z_h = (2 * in_h + k - 2) + pad0 + pad1 - kb + 1
                z_w = (2 * in_w + k - 2) + pad0 + pad1 - kb + 1
                start = kb - 1 - pad0
                out = lax.slice(
                    full, (0, start, start, 0),
                    (full.shape[0], start + z_h, start + z_w, full.shape[3]))
                if self.demodulate:
                    out = out * demod[:, None, None, :].astype(out.dtype)
            else:
                out = _conv_transpose2x(x, w)
                if self.demodulate:
                    out = out * demod[:, None, None, :].astype(out.dtype)
                out = Blur(self.blur_kernel, pad=(pad0, pad1),
                           upsample_factor=factor)(out)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad = ((p + 1) // 2, p // 2)
            x = Blur(self.blur_kernel, pad=pad)(x)
            out = lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
        else:
            out = lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)

        return out, s

    def _s2d_path(self, x, w, demod, s, s2d_in: bool, s2d_out: bool):
        """Space-to-depth execution of the three conv shapes used by the
        generator's octaves (up-conv, 3x3 conv, 1x1 to_rgb)."""
        k = self.kernel_size
        assert s2d_out, "s2d_in without s2d_out is not used"
        if self.upsample:
            assert not s2d_in and self.fuse_blur
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            blur2d = make_kernel(self.blur_kernel) * (factor ** 2)
            v6 = _merge_blur_into_transpose_weight(w, blur2d, pad0)
            kern = _upconv6_weight_to_s2d(v6)
            out = lax.conv_general_dilated(
                x, kern.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif k == 3:
            assert s2d_in
            kern = _conv3_weight_to_s2d(w)
            out = lax.conv_general_dilated(
                x, kern.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif k == 1:
            assert s2d_in
            # NB: a reshape-to-GEMM formulation is mathematically cleaner
            # (1x1 is phase-transparent) but measured 1.8x SLOWER end to
            # end — the (B,P,C) reshape forces layout copies of the full
            # tensor. The block-diagonal conv stays.
            kern = _conv1_weight_to_s2d(w)
            out = lax.conv_general_dilated(
                x, kern.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            raise NotImplementedError(f"s2d path for kernel {k}")
        if demod is not None:
            out = out * jnp.tile(demod, (1, 4))[:, None, None, :].astype(
                out.dtype)
        return out, s


class NoiseInjection(fnn.Module):
    """x + weight·noise (model.py:279-290). noise: (B,H,W,1) or None.

    When noise is None, draws from the 'noise' RNG stream.
    """

    @fnn.compact
    def __call__(self, x, noise=None):
        w = self.param("weight", fnn.initializers.zeros, (1,))
        if noise is None:
            key = self.make_rng("noise")
            noise = jax.random.normal(key, (x.shape[0], x.shape[1], x.shape[2], 1),
                                      dtype=x.dtype)
        return x + w.astype(x.dtype) * noise.astype(x.dtype)


class ConstantInput(fnn.Module):
    """Learned 4x4 constant (model.py:293-303), NHWC."""
    channel: int
    size: int = 4

    @fnn.compact
    def __call__(self, batch: int):
        const = self.param(
            "input", fnn.initializers.normal(1.0),
            (1, self.size, self.size, self.channel),
        )
        return jnp.broadcast_to(const, (batch, self.size, self.size, self.channel))


class StyledConv(fnn.Module):
    """ModulatedConv2d + noise + FusedLeakyReLU (model.py:306-340)."""
    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True

    @fnn.compact
    def __call__(self, x, style, noise=None, input_is_stylespace: bool = False,
                 s2d_in: bool = False, s2d_out: bool = False):
        out, s = ModulatedConv2d(
            self.in_channel, self.out_channel, self.kernel_size, self.style_dim,
            demodulate=self.demodulate, upsample=self.upsample,
            blur_kernel=self.blur_kernel, name="conv",
        )(x, style, input_is_stylespace=input_is_stylespace,
          s2d_in=s2d_in, s2d_out=s2d_out)
        bias = self.param("activate_bias", fnn.initializers.zeros,
                          (self.out_channel,))
        if s2d_out:
            # per-pixel iid noise in s2d layout: one value per phase,
            # broadcast across the channel block (phase-major order). The
            # broadcast happens on a (B,H,W,4,C) view — materializing
            # jnp.repeat(noise4, C) costs two full-tensor copies per layer
            # (profiled at 512²x128).
            if noise is None:
                key = self.make_rng("noise")
                noise4 = jax.random.normal(
                    key, (out.shape[0], out.shape[1], out.shape[2], 4),
                    out.dtype)
            else:
                noise4 = space_to_depth(noise).astype(out.dtype)
            b, h, w_, _ = out.shape
            out5 = out.reshape(b, h, w_, 4, self.out_channel)
            out5 = NoiseInjection(name="noise")(out5, noise=noise4[..., None])
            out = out5.reshape(b, h, w_, 4 * self.out_channel)
            return fused_leaky_relu(out, jnp.tile(bias, 4)), s
        out = NoiseInjection(name="noise")(out, noise=noise)
        return fused_leaky_relu(out, bias), s


def _skip_upsample_s2d_kernel(blur_kernel, channels: int) -> jnp.ndarray:
    """Blur-upsample (upfirdn up=2, pad=(2,1)) as a stride-1 phase conv that
    emits space-to-depth layout directly: (3, 3, C, 4C), channel-diagonal.

    Derivation: out pixel j = 2I + a reads stuffed position j + t - 2, so
    tap t = 2r − a with grid offset r − 1 → K_a[r] = k̃[2r − a] per axis
    (k̃ = flipped 4-tap blur × up², as in Upsample)."""
    k2 = make_kernel(blur_kernel) * 4.0
    k2 = k2[::-1, ::-1]
    kern = np.zeros((3, 3, channels, 4 * channels), np.float32)
    for a1 in range(2):
        for a2 in range(2):
            for r1 in range(3):
                for r2 in range(3):
                    t1, t2 = 2 * r1 - a1, 2 * r2 - a2
                    if not (0 <= t1 < 4 and 0 <= t2 < 4):
                        continue
                    for c in range(channels):
                        kern[r1, r2, c, (a1 * 2 + a2) * channels + c] = \
                            k2[t1, t2]
    return jnp.asarray(kern)


class ToRGB(fnn.Module):
    """1x1 modulated conv to RGB + skip upsample-add (model.py:343-362).

    ``rgb_dtype``: compute/storage dtype of the accumulating skip chain.
    fp32 by default; bf16 is the serving policy — every rgb/skip tensor has
    3 (or 12, s2d) channels in the minor dim, which the TPU pads to 128
    lanes, so the chain's bandwidth is dominated by padding and halving the
    element size halves the real traffic (profiled: the rgb chain was ~45%
    of a 1024² synthesis step at fp32).
    """
    in_channel: int
    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    rgb_dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, style, skip=None, input_is_stylespace: bool = False,
                 s2d_in: bool = False, defer_d2s: bool = False):
        """``defer_d2s``: with ``s2d_in``, do the bias-add and the skip
        upsample-add entirely in s2d layout and return the (B, H, W, 12)
        s2d RGB — the caller depth-to-spaces once at the very end. The
        pixel-layout round-trip here (d2s copy + fp32 convert + full-res
        dilated conv + output relayout) was ~20% of a 1024² synthesis step.
        """
        out, s = ModulatedConv2d(
            self.in_channel, 3, 1, self.style_dim, demodulate=False, name="conv"
        )(x, style, input_is_stylespace=input_is_stylespace,
          s2d_in=s2d_in, s2d_out=s2d_in)
        bias = self.param("bias", fnn.initializers.zeros, (1, 1, 1, 3))
        rdt = self.rgb_dtype
        if s2d_in and defer_d2s:
            # stay in s2d: bias tiles phase-major; the skip upsample is a
            # stride-1 phase conv emitting s2d directly
            out = out.astype(rdt) + jnp.tile(bias, (1, 1, 1, 4)).astype(rdt)
            if skip is not None:
                kern = _skip_upsample_s2d_kernel(self.blur_kernel,
                                                 skip.shape[-1])
                skip_s2d = lax.conv_general_dilated(
                    skip.astype(rdt), kern.astype(rdt), (1, 1),
                    ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = out + skip_s2d
            return out, s
        if s2d_in:
            out = depth_to_space(out)  # rgb is tiny — back to pixels here
        out = out.astype(rdt)
        out = out + bias.astype(rdt)
        if skip is not None:
            skip = Upsample(self.blur_kernel, name="upsample")(
                skip.astype(rdt))
            out = out + skip
        return out, s


class ConvLayer(fnn.Module):
    """(Blur+)EqualConv2d(+FusedLReLU) stack for the discriminator/encoders
    (model.py:577-623)."""
    in_channel: int
    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @fnn.compact
    def __call__(self, x, s2d_in: bool = False):
        """``s2d_in``: x arrives in space-to-depth layout. Non-downsample
        layers stay in s2d layout (exact weight transform); downsample
        layers consume s2d and emit pixel layout at half resolution (the
        merged blur+stride-2 kernel, derivation at
        _downconv_weight_to_s2d)."""
        s2d_out = s2d_in and not self.downsample
        factor = 2
        p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
        pad = ((p + 1) // 2, p // 2)
        conv = EqualConv2d(
            self.in_channel, self.out_channel, self.kernel_size,
            stride=2 if self.downsample else 1,
            padding=0 if self.downsample else self.kernel_size // 2,
            use_bias=self.use_bias and not self.activate, name="conv",
        )
        if self.downsample and s2d_in:
            blur_2d = np.asarray(make_kernel(self.blur_kernel))
            x = conv(x, s2d_down=(blur_2d, pad[0]))
        elif self.downsample:
            x = Blur(self.blur_kernel, pad=pad)(x)
            x = conv(x)
        else:
            x = conv(x, s2d=s2d_in)
        if self.activate:
            if self.use_bias:
                bias = self.param("activate_bias", fnn.initializers.zeros,
                                  (self.out_channel,))
                x = fused_leaky_relu(x, jnp.tile(bias, 4) if s2d_out
                                     else bias)
            else:
                x = jnp.where(x >= 0, x, x * 0.2) * math.sqrt(2.0)
        return x


class ResBlock(fnn.Module):
    """Discriminator residual block (model.py:626-644)."""
    in_channel: int
    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @fnn.compact
    def __call__(self, x, s2d_in: bool = False):
        out = ConvLayer(self.in_channel, self.in_channel, 3,
                        name="conv1")(x, s2d_in=s2d_in)
        out = ConvLayer(self.in_channel, self.out_channel, 3, downsample=True,
                        name="conv2")(out, s2d_in=s2d_in)
        skip = ConvLayer(self.in_channel, self.out_channel, 1, downsample=True,
                         activate=False, use_bias=False,
                         name="skip")(x, s2d_in=s2d_in)
        return (out + skip) / math.sqrt(2.0)
