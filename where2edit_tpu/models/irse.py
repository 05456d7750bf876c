"""IR / IR-SE (ArcFace) backbones, NHWC.

Reference: models/encoders/helpers.py:11-140 and
models/facial_recognition/model_irse.py:9-84 (the two reference copies are
whitespace-identical; one implementation here serves both the pSp/e4e
encoder body and the ID-loss network).

These networks are always *frozen* in the reference pipelines (loaded from
pretrained checkpoints, eval mode), so BatchNorm runs with stored running
stats and Dropout is inert.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from flax import linen as fnn
from jax import lax

from where2edit_tpu.ops.interpolate import adaptive_avg_pool


class BlockSpec(NamedTuple):
    in_channel: int
    depth: int
    stride: int


def get_block(in_channel: int, depth: int, num_units: int,
              stride: int = 2) -> list[BlockSpec]:
    return [BlockSpec(in_channel, depth, stride)] + [
        BlockSpec(depth, depth, 1) for _ in range(num_units - 1)
    ]


def get_blocks(num_layers: int) -> list[list[BlockSpec]]:
    """models/encoders/helpers.py:30-54."""
    if num_layers == 50:
        return [
            get_block(64, 64, 3),
            get_block(64, 128, 4),
            get_block(128, 256, 14),
            get_block(256, 512, 3),
        ]
    if num_layers == 100:
        return [
            get_block(64, 64, 3),
            get_block(64, 128, 13),
            get_block(128, 256, 30),
            get_block(256, 512, 3),
        ]
    if num_layers == 152:
        return [
            get_block(64, 64, 3),
            get_block(64, 128, 8),
            get_block(128, 256, 36),
            get_block(256, 512, 3),
        ]
    raise ValueError(f"invalid num_layers {num_layers}")


def l2_norm(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


class PReLU(fnn.Module):
    """Per-channel PReLU (torch nn.PReLU(C))."""
    channels: int

    @fnn.compact
    def __call__(self, x):
        a = self.param("alpha", fnn.initializers.constant(0.25), (self.channels,))
        return jnp.where(x >= 0, x, x * a.astype(x.dtype))


# convs whose OUTPUT has at most this many positions run as im2col matmuls:
# mathematically identical, but the XLA TPU conv emitter spends ~1 min per
# conv instance at tiny shapes (measured: one 512-ch 64→1 conv chain =
# 336 s remote compile vs 27 s as GEMMs) while the equivalent GEMM compiles
# instantly. The threshold matters for RUNTIME too: im2col amplifies input
# reads 9x (the patch tensor), so mid-spatial convs must stay real convs —
# lowering the cap from 128² to 16² positions took the e4e invert from
# 2.84 to 1.86 ms/img on-chip at unchanged compile times (PERF.md).
_CONV_AS_MATMUL_MAX_POSITIONS = int(
    __import__("os").environ.get("W2E_IM2COL_MAX_POSITIONS", 16 * 16))


def conv2d_im2col(x, w, stride: int, padding: int):
    """3x3/kxk conv as patch-gather + matmul (exact). x NHWC, w HWIO."""
    kh, kw, cin, cout = w.shape
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                        (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    ho = (h - kh) // stride + 1
    wo = (wd - kw) // stride + 1
    cols = [
        x[:, dy:dy + stride * ho:stride, dx:dx + stride * wo:stride, :]
        for dy in range(kh) for dx in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B,ho,wo,kh*kw*cin)
    return patches @ w.reshape(kh * kw * cin, cout).astype(patches.dtype)


class Conv(fnn.Module):
    """Plain torch-Conv2d equivalent, NHWC/HWIO."""
    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "weight", fnn.initializers.lecun_normal(),
            (k, k, self.in_channel, self.out_channel),
        )
        out_h = (x.shape[1] + 2 * self.padding - k) // self.stride + 1
        out_w = (x.shape[2] + 2 * self.padding - k) // self.stride + 1
        if out_h * out_w <= _CONV_AS_MATMUL_MAX_POSITIONS:
            out = conv2d_im2col(x, w, self.stride, self.padding)
        else:
            out = lax.conv_general_dilated(
                x, w.astype(x.dtype), (self.stride, self.stride),
                ((self.padding, self.padding), (self.padding, self.padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", fnn.initializers.zeros, (self.out_channel,))
            out = out + b.astype(out.dtype)
        return out


def batch_norm(name: str = "bn", affine: bool = True, dtype=None):
    """``dtype`` is the compute dtype (flax casts inputs AND the fp32
    running stats down) — BatchNorm is the only op in this stack that
    otherwise promotes activations back to fp32 through its params, so a
    bf16 serving pass must thread it explicitly."""
    return fnn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         use_scale=affine, use_bias=affine, dtype=dtype,
                         name=name)


class SEModule(fnn.Module):
    """Squeeze-excite (helpers.py:57-73)."""
    channels: int
    reduction: int = 16

    @fnn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(self.channels, self.channels // self.reduction, 1,
                 use_bias=False, name="fc1")(s)
        s = jnp.maximum(s, 0.0)
        s = Conv(self.channels // self.reduction, self.channels, 1,
                 use_bias=False, name="fc2")(s)
        return x * fnn.sigmoid(s)


class BottleneckIR(fnn.Module):
    """helpers.py:76-95 (+ SE variant :98-120)."""
    in_channel: int
    depth: int
    stride: int
    use_se: bool = False
    dtype: jnp.dtype | None = None

    @fnn.compact
    def __call__(self, x):
        if self.in_channel == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :]  # MaxPool2d(1, s)
        else:
            shortcut = Conv(self.in_channel, self.depth, 1, stride=self.stride,
                            use_bias=False, name="shortcut_conv")(x)
            shortcut = batch_norm("shortcut_bn", dtype=self.dtype)(shortcut)
        res = batch_norm("bn1", dtype=self.dtype)(x)
        res = Conv(self.in_channel, self.depth, 3, padding=1, use_bias=False,
                   name="conv1")(res)
        res = PReLU(self.depth, name="prelu")(res)
        res = Conv(self.depth, self.depth, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv2")(res)
        res = batch_norm("bn2", dtype=self.dtype)(res)
        if self.use_se:
            res = SEModule(self.depth, name="se")(res)
        return res + shortcut


class _BottleneckCell(fnn.Module):
    """Scan cell: one stride-1 in==out bottleneck (the uniform stage tail)."""
    depth: int
    use_se: bool
    dtype: jnp.dtype | None = None

    @fnn.compact
    def __call__(self, x, _):
        out = BottleneckIR(self.depth, self.depth, 1, use_se=self.use_se,
                           dtype=self.dtype, name="blk")(x)
        return out, None


class IRSEBody(fnn.Module):
    """input_layer + residual trunk shared by every IR-SE consumer.

    Returns the final 512ch map plus the FPN taps at body indices 6/20/23
    (models/encoders/psp_encoders.py:100-107).

    TPU note: each stage's uniform tail (stride-1, in==out blocks) runs as
    ONE ``nn.scan`` over stacked params instead of N unrolled blocks — the
    ir_se50 trunk drops from 50 block bodies to 8 in HLO, cutting XLA
    compile time ~5x with identical numerics. The FPN taps (6/20/23) sit at
    stage ends for the 50-layer table, so scanning never hides a tap; the
    100/152 tables put them mid-stage, so ``want_taps`` falls back to the
    unrolled trunk there (only the tap-less ``Backbone`` uses those depths).
    """
    num_layers: int = 50
    mode: str = "ir_se"
    dtype: jnp.dtype | None = None

    @fnn.compact
    def __call__(self, x, want_taps: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = Conv(3, 64, 3, padding=1, use_bias=False, name="input_conv")(x)
        x = batch_norm("input_bn", dtype=self.dtype)(x)
        x = PReLU(64, name="input_prelu")(x)
        use_se = self.mode == "ir_se"
        taps = {}
        # stage ends for the 50-layer table land exactly on the tap indices
        scan_ok = not want_taps or self.num_layers == 50
        idx = 0
        for si, block in enumerate(get_blocks(self.num_layers)):
            if scan_ok:
                head, tail = block[0], block[1:]
                x = BottleneckIR(head.in_channel, head.depth, head.stride,
                                 use_se=use_se, dtype=self.dtype,
                                 name=f"body_{idx}")(x)
                idx += 1
                if tail:
                    Scan = fnn.scan(
                        _BottleneckCell,
                        variable_axes={"params": 0, "batch_stats": 0},
                        split_rngs={"params": True},
                        length=len(tail))
                    x, _ = Scan(head.depth, use_se, self.dtype,
                                name=f"stage{si}_tail")(x, None)
                    idx += len(tail)
                if idx - 1 in (6, 20, 23):
                    taps[idx - 1] = x
            else:
                for spec in block:
                    x = BottleneckIR(spec.in_channel, spec.depth, spec.stride,
                                     use_se=use_se, dtype=self.dtype,
                                     name=f"body_{idx}")(x)
                    if idx in (6, 20, 23):
                        taps[idx] = x
                    idx += 1
        if want_taps:
            return x, taps
        return x


class Backbone(fnn.Module):
    """ArcFace recognition net (model_irse.py:9-47). Output: l2-normalized 512-d."""
    input_size: int = 112
    num_layers: int = 50
    mode: str = "ir_se"
    drop_ratio: float = 0.4
    affine: bool = True

    @fnn.compact
    def __call__(self, x, deterministic: bool = True):
        assert self.input_size in (112, 224)
        x = IRSEBody(self.num_layers, self.mode, name="body")(x)
        x = batch_norm("output_bn")(x)
        x = fnn.Dropout(self.drop_ratio, deterministic=deterministic)(x)
        # torch flattens NCHW — transpose so the Linear weights line up
        b = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        spatial = 7 if self.input_size == 112 else 14
        w = self.param("output_weight", fnn.initializers.lecun_normal(),
                       (512 * spatial * spatial, 512))
        bias = self.param("output_bias", fnn.initializers.zeros, (512,))
        x = x @ w + bias
        x = fnn.BatchNorm(use_running_average=True, epsilon=1e-5,
                          use_scale=self.affine, use_bias=self.affine,
                          name="output_bn1d")(x)
        return l2_norm(x)
