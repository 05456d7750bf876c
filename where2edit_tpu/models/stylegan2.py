"""StyleGAN2 generator/discriminator with region-attention synthesis, NHWC.

Single model covering both reference variants (which are byte-identical except
for ``Generator.forward``):

  * canonical generator      — models/stylegan2/model.py:365-574
  * attention fork           — attention/attention_model.py:473-676
    (feature taps via ``return_features``; masked blending via
    ``attention_layer``/``attention_map``/``feature_map``)

Layer schedule at 1024px: conv1, to_rgb1, then 8 octaves of
(up-conv, conv, to_rgb) → 26 style vectors / 26 feature taps. The 1-based
``attention_layer`` counter indexes this tap list exactly as the fork
(attention_model.py:545-560): blending at layer L also rewrites the *next*
to_rgb skip (the ``this_layer`` coupling, attention_model.py:558-561).

All blend positions are resolved at trace time (static ``attention_layer``),
so XLA sees straight-line code — no data-dependent control flow.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from where2edit_tpu.nn.layers import (
    ConstantInput,
    ConvLayer,
    EqualLinear,
    ResBlock,
    StyledConv,
    ToRGB,
    depth_to_space,
    pixel_norm,
)
from where2edit_tpu.ops.interpolate import interpolate_nearest


def channel_table(channel_multiplier: int = 2) -> dict[int, int]:
    """models/stylegan2/model.py:392-402."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class GeneratorOutput(NamedTuple):
    image: jnp.ndarray                       # (B, size, size, 3)
    latent: Any = None                       # W+ (B, n_latent, 512) or S-space list
    style_vector: Optional[list] = None      # 26x (B, C) S-space vectors
    feature_map: Optional[list] = None       # 26x (B, h, w, C) feature taps


def blend_tap_indices(attention_layer: int) -> list:
    """0-based tap indices the masked blend actually reads (``tap`` below):
    the attention layer itself plus — when the attention layer is a conv —
    the octave's to_rgb skip (the reference fork's ``this_layer`` coupling,
    attention_model.py:546-561).

    Everything else in the capture list is only ever consumed through the
    (subsample-exact) mapper taps, so serving captures and the training
    step's no-grad syntheses can drop the other full-res taps entirely
    (the to_rgb taps are 3-channel and pad 42x under the TPU (8,128) tiled
    layout — materializing them dominated the capture stage, PERF.md)."""
    idxs = {attention_layer - 1}
    layer = attention_layer + 1
    while not (layer == 2 or (layer > 2 and (layer - 2) % 3 == 0)):
        layer += 1  # advance to the octave's to_rgb layer
    convs_since_prev_rgb = (1,) if layer == 2 else (layer - 2, layer - 1)
    if attention_layer in convs_since_prev_rgb:
        idxs.add(layer - 1)
    return sorted(idxs)


def _blend(out: jnp.ndarray, mask: jnp.ndarray, orig: jnp.ndarray) -> jnp.ndarray:
    """mask·out + (1-mask)·orig with nearest-resized single-channel mask.

    attention/attention_model.py:548-549 — the reference channel-repeat is a
    broadcast in NHWC.
    """
    m = interpolate_nearest(mask, out.shape[1]).astype(out.dtype)
    return m * out + (1.0 - m) * orig


class Generator(fnn.Module):
    """``dtype`` is the synthesis compute precision: activations/convs run in
    it (bf16 → MXU native rate) while the style MLP, modulation/demod math
    (nn.layers:ModulatedConv2d keeps demod rsqrt in fp32) and the RGB skip
    chain stay fp32 — measured SSIM(bf16, fp32) > 0.999."""
    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    dtype: jnp.dtype = jnp.float32
    # run the final N octaves in space-to-depth layout (2x2 blocks folded
    # into channels): 4x wider channels fill the MXU / (8,128) tiles that
    # 16-32ch full-res convs waste. Exact (weight transforms), but masked
    # blending inside the s2d region is unsupported (asserted).
    s2d_octaves: int = 0
    # with a bf16 ``dtype``, run the FIRST N octaves (plus the 4x4 stem) in
    # fp32 and switch to bf16 after: early-octave rounding compounds through
    # every later conv+demod, so pinning the cheap low-res layers recovers
    # most of the fp32 SSIM at ~1% of the fp32 cost (the last octaves hold
    # >75% of the FLOPs). 0 = all-bf16 (stem included).
    fp32_head_octaves: int = 0
    # dtype of the accumulating RGB skip chain (see nn.layers.ToRGB): fp32
    # default; bf16 halves the chain's (padding-dominated) HBM traffic for
    # serving. The returned image is in this dtype.
    rgb_dtype: jnp.dtype = jnp.float32
    # Spatial (SP) sharding: with a jax.sharding.Mesh here, every octave's
    # activations are sharding-constrained along H over ``spatial_axis`` and
    # GSPMD partitions the convs with automatic halo exchanges — the
    # TPU-native way to scale the 1024² synthesis activations beyond one
    # chip's HBM or to cut batch-1 latency (SURVEY.md §2.3: the reference
    # has no model parallelism; this is the idiomatic extension). The batch
    # dim is left UNCONSTRAINED so a data axis composes (DP x SP meshes).
    # Exactness: conv halo exchange is bit-exact (tests/test_spatial_sharding).
    spatial_mesh: Optional[Any] = None
    spatial_axis: str = "sp"
    # only shard tensors with at least this many rows per shard — tiny
    # octaves would pay collective latency for no memory/compute relief
    spatial_min_rows_per_shard: int = 4

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    def setup(self):
        channels = channel_table(self.channel_multiplier)
        self.channels = channels

        self.style = [
            EqualLinear(self.style_dim, self.style_dim, lr_mul=self.lr_mlp,
                        activation="fused_lrelu")
            for _ in range(self.n_mlp)
        ]

        self.input = ConstantInput(channels[4])
        self.conv1 = StyledConv(channels[4], channels[4], 3, self.style_dim,
                                blur_kernel=self.blur_kernel)
        self.to_rgb1 = ToRGB(channels[4], self.style_dim, upsample=False,
                             rgb_dtype=self.rgb_dtype)

        convs, to_rgbs = [], []
        in_ch = channels[4]
        for i in range(3, self.log_size + 1):
            out_ch = channels[2 ** i]
            convs.append(StyledConv(in_ch, out_ch, 3, self.style_dim,
                                    upsample=True, blur_kernel=self.blur_kernel))
            convs.append(StyledConv(out_ch, out_ch, 3, self.style_dim,
                                    blur_kernel=self.blur_kernel))
            to_rgbs.append(ToRGB(out_ch, self.style_dim,
                                 rgb_dtype=self.rgb_dtype))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

        # fixed per-layer noise buffers (model.py:420-423), NHWC
        self.noises = [
            self.variable(
                "noises", f"noise_{i}",
                lambda shape=None, li=i: jnp.zeros(
                    (1, 2 ** ((li + 5) // 2), 2 ** ((li + 5) // 2), 1),
                    jnp.float32,
                ),
            )
            for i in range(self.num_layers)
        ]

    def style_mlp(self, z: jnp.ndarray) -> jnp.ndarray:
        """z → w (model.py:381-390): PixelNorm + 8 equalized fused-lrelu FCs."""
        x = pixel_norm(z)
        for layer in self.style:
            x = layer(x)
        return x

    def mean_latent(self, key: jax.Array, n_latent: int) -> jnp.ndarray:
        """model.py:462-468."""
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.style_mlp(z), axis=0, keepdims=True)

    def get_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.style_mlp(z)

    def __call__(
        self,
        styles,
        *,
        return_latents: bool = False,
        return_features: bool = False,
        inject_index: Optional[int] = None,
        truncation: float = 1.0,
        truncation_latent: Optional[jnp.ndarray] = None,
        input_is_latent: bool = False,
        input_is_stylespace: bool = False,
        noise: Optional[list] = None,
        randomize_noise: bool = True,
        attention_layer: int = 0,
        attention_map: Optional[jnp.ndarray] = None,
        feature_map: Optional[list] = None,
        tap_subsample: Optional[int] = None,
        tap_indices: Optional[Sequence[int]] = None,
    ) -> GeneratorOutput:
        """Forward synthesis.

        ``tap_subsample``/``tap_indices`` (static): serving-capture controls
        for ``return_features``. Taps larger than ``tap_subsample`` are
        stored nearest-subsampled to it (exact for every mapper consumer —
        the attention convs are pointwise, so conv∘subsample ≡
        subsample∘conv); s2d-octave taps subsample directly in s2d space
        (pixel (s·i, s·j) ≡ s2d position (s/2·i, s/2·j) phase (0,0)), which
        removes the per-tap depth_to_space relayouts that dominated the
        capture stage (PERF.md). Taps not in ``tap_indices`` are stored as
        None and never materialized. Both default to the full-resolution
        26-tap capture (training / torch-parity behavior).

        ``styles``: list of (B, 512) z/w, or (B, n_latent, 512) W+, or — with
        ``input_is_stylespace`` — a list of 26 (B, C_i) style vectors.
        ``attention_map``: (B, h, w, 1) mask; requires ``feature_map`` (the
        original features from a prior ``return_features`` pass, + optionally
        the const input appended — only the first 26 entries are read).
        """
        if not input_is_latent and not input_is_stylespace:
            styles = [self.style_mlp(s) for s in styles]

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [v.value for v in self.noises]

        if truncation < 1 and not input_is_stylespace:
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

        if input_is_stylespace:
            latent = list(styles)
        elif len(styles) < 2:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None, :], self.n_latent, axis=1)
            else:
                latent = styles[0]
        else:
            if inject_index is None:
                key = self.make_rng("mixing")
                inject_index = jax.random.randint(key, (), 1, self.n_latent)
            row = jnp.arange(self.n_latent)[None, :, None]
            latent = jnp.where(
                row < inject_index,
                styles[0][:, None, :],
                styles[1][:, None, :],
            )

        blending = attention_map is not None
        style_vector: list = []
        taps: list = []

        if self.spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec  # noqa: PLC0415

            # TP x SP on one mesh silently MISCOMPILES (XLA SPMD
            # wrong-values fallback, b/433785288 — parallel/tp.py
            # docstring). shard_generator_params marks its trees with a
            # tp_meta collection; presence is structural, so this raises
            # inside jit traces too rather than corrupting outputs.
            if self.has_variable("tp_meta", "tp"):
                raise ValueError(
                    "TP-sharded generator params (shard_generator_params) "
                    "combined with Generator(spatial_mesh=...) is "
                    "unsupported: XLA's SPMD partitioner produces wrong "
                    "values on the channel+spatial resharding "
                    "(b/433785288). Pick ONE of TP or SP per program — "
                    "see where2edit_tpu/parallel/tp.py.")
            n_shards = self.spatial_mesh.shape[self.spatial_axis]
            sp_sharding = NamedSharding(
                self.spatial_mesh,
                PartitionSpec(PartitionSpec.UNCONSTRAINED, self.spatial_axis))

            def shard_sp(x):
                if x.shape[1] < self.spatial_min_rows_per_shard * n_shards:
                    return x
                return jax.lax.with_sharding_constraint(x, sp_sharding)
        else:
            shard_sp = lambda x: x  # noqa: E731

        keep_taps = None if tap_indices is None else set(tap_indices)

        def store(x, idx):
            """What lands in the feature list: None for dropped indices,
            the nearest-subsampled tap above ``tap_subsample``, else x."""
            if keep_taps is not None and idx not in keep_taps:
                return None
            if tap_subsample is not None and x.shape[1] > tap_subsample:
                s = x.shape[1] // tap_subsample
                return x[:, ::s, ::s, :]
            return x

        def tap(x):
            """Record a feature / apply the mask-blend at this 1-based layer.

            Blend when layer == attention_layer; additionally a to_rgb layer
            blends when any conv since the previous to_rgb was the attention
            layer (the fork's ``this_layer`` flag, attention_model.py:546-561
            — note the flag survives the mid-octave conv, so attention on a
            conv_up also rewrites the octave's to_rgb skip).
            """
            idx = len(taps)  # 0-based position == layer-1
            if blending and attention_layer >= 1:
                layer = idx + 1
                is_to_rgb = layer == 2 or (layer > 2 and (layer - 2) % 3 == 0)
                convs_since_prev_rgb = (
                    (1,) if layer == 2 else (layer - 2, layer - 1)
                )
                hit = layer == attention_layer or (
                    is_to_rgb and attention_layer in convs_since_prev_rgb
                )
                if hit:
                    x = _blend(x, attention_map, feature_map[idx].astype(x.dtype))
            taps.append(store(x, idx))
            return x

        def tap_s2d(x):
            """Tap an s2d-layout tensor. With ``tap_subsample`` the slice
            happens IN s2d space — pixel (s·i, s·j) is s2d element
            (s/2·i, s/2·j) in phase (0,0), i.e. the first C channels of the
            (by, bx, c)-ordered block dim — so no depth_to_space relayout is
            ever materialized for these taps. (Blending inside the s2d
            region is rejected up front, so no blend logic here.)"""
            idx = len(taps)
            if keep_taps is not None and idx not in keep_taps:
                taps.append(None)
                return
            h_pix = x.shape[1] * 2
            if tap_subsample is not None and h_pix > tap_subsample:
                s = h_pix // tap_subsample  # both powers of two → s even
                c = x.shape[-1] // 4
                # two slices with a barrier between: the spatial stride is a
                # cheap row-strided read (like every non-s2d tap), while the
                # fused spatial+lane slice makes XLA relayout the ENTIRE
                # activation first (measured 13.7 ms for one 512²x128 bf16
                # tensor vs ~0.5 ms this way, PERF.md)
                small = jax.lax.optimization_barrier(
                    x[:, :: s // 2, :: s // 2, :])
                taps.append(small[..., :c])
            else:
                taps.append(depth_to_space(x))

        # stem runs fp32 whenever any head octave is pinned fp32
        stem_dtype = jnp.float32 if self.fp32_head_octaves > 0 else self.dtype
        if not input_is_stylespace:
            batch = latent.shape[0]
            out = self.input(batch).astype(stem_dtype)
            out, s = self.conv1(out, latent[:, 0], noise=noise[0])
            out = tap(out)
            style_vector.append(s)
            skip, s = self.to_rgb1(out, latent[:, 1])
            skip = tap(skip)
            style_vector.append(s)
            i = 1
            get = lambda j: latent[:, j]  # noqa: E731
            step = 2
        else:
            batch = latent[0].shape[0]
            out = self.input(batch).astype(stem_dtype)
            out, s = self.conv1(out, latent[0], noise=noise[0],
                                input_is_stylespace=True)
            out = tap(out)
            style_vector.append(s)
            skip, s = self.to_rgb1(out, latent[1], input_is_stylespace=True)
            skip = tap(skip)
            style_vector.append(s)
            i = 2
            get = lambda j: latent[j]  # noqa: E731
            step = 3

        n_oct = len(self.to_rgbs)
        s2d_start = n_oct - min(self.s2d_octaves, n_oct)
        if blending and self.s2d_octaves > 0:
            # blend targets must sit below the s2d region (tap index of the
            # region's first conv is 2 + 3·s2d_start, 1-based)
            assert attention_layer + 1 < 2 + 3 * s2d_start + 1, (
                "masked blending inside the s2d octaves is unsupported")

        prev_s2d = False
        for oct_idx in range(n_oct):
            conv_up = self.convs[2 * oct_idx]
            conv = self.convs[2 * oct_idx + 1]
            to_rgb = self.to_rgbs[oct_idx]
            n1 = noise[1 + 2 * oct_idx]
            n2 = noise[2 + 2 * oct_idx]
            use_s2d = oct_idx >= s2d_start
            if self.fp32_head_octaves > 0 and oct_idx == self.fp32_head_octaves:
                out = out.astype(self.dtype)  # fp32 head → bf16 tail

            if prev_s2d:
                # hand off between s2d octaves in pixel layout (one cheap
                # transpose of a mid-resolution tensor)
                out = depth_to_space(out)
            prev_s2d = use_s2d

            if use_s2d:
                out, s1 = conv_up(out, get(i), noise=n1,
                                  input_is_stylespace=input_is_stylespace,
                                  s2d_out=True)
                out = shard_sp(out)
                tap_s2d(out)
                out, s2 = conv(out, get(i + 1), noise=n2,
                               input_is_stylespace=input_is_stylespace,
                               s2d_in=True, s2d_out=True)
                out = shard_sp(out)
                tap_s2d(out)
                # the final octave's to_rgb + skip-add stay in s2d layout;
                # ONE depth_to_space materializes the image after the loop
                defer = oct_idx == n_oct - 1
                skip, s3 = to_rgb(out, get(i + 2), skip,
                                  input_is_stylespace=input_is_stylespace,
                                  s2d_in=True, defer_d2s=defer)
                if defer:
                    tap_s2d(skip)
                else:
                    skip = tap(skip)
            else:
                out, s1 = conv_up(out, get(i), noise=n1,
                                  input_is_stylespace=input_is_stylespace)
                out = shard_sp(out)
                out = tap(out)
                out, s2 = conv(out, get(i + 1), noise=n2,
                               input_is_stylespace=input_is_stylespace)
                out = shard_sp(out)
                out = tap(out)
                skip, s3 = to_rgb(out, get(i + 2), skip,
                                  input_is_stylespace=input_is_stylespace)
                skip = shard_sp(skip)
                skip = tap(skip)
            style_vector.extend([s1, s2, s3])
            i += step

        if prev_s2d:
            skip = depth_to_space(skip)  # deferred final to_rgb d2s
        image = skip
        return GeneratorOutput(
            image=image,
            latent=latent if (return_latents or return_features) else None,
            style_vector=style_vector if (return_latents or return_features) else None,
            feature_map=taps if return_features else None,
        )


class Discriminator(fnn.Module):
    """models/stylegan2/model.py:647-705 (ResBlocks + minibatch stddev).

    ``dtype``: compute dtype for the conv tower (params stay fp32; the
    minibatch-stddev statistic and the callers' losses accumulate fp32).
    ``remat``: jax.checkpoint each ResBlock — with bf16 these lift the
    1024² d_step compile/HBM ceiling from batch 4 to 16+ (the fp32 tower's
    grad needs ~14 GiB of temps at batch 4 alone; tools/d_step_probe.py,
    PERF.md "Adversarial (GAN) training step").
    ``s2d_octaves``: run the first N octaves space-to-depth — EXACT weight
    transforms (the generator's s2d lever, mirrored: the 1024²
    ≤32-channel convs underfill the 128-lane MXU 4×; in s2d layout they
    run as half-res 4×-channel convs). conv_in and each octave's conv1
    stay in s2d layout; the downsample convs consume s2d and emit pixel
    layout via the merged blur+stride-2 kernel
    (nn/layers.py::_downconv_weight_to_s2d). Parity:
    tests/test_gan_training.py::test_discriminator_s2d_octaves_exact.
    """
    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    dtype: Any = jnp.float32
    remat: bool = False
    s2d_octaves: int = 0

    @fnn.compact
    def __call__(self, x):
        from where2edit_tpu.nn.layers import space_to_depth  # noqa: PLC0415

        channels = channel_table(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        n_oct = log_size - 2  # number of ResBlocks
        s2d_n = max(0, min(self.s2d_octaves, n_oct))
        x = x.astype(self.dtype)
        if s2d_n > 0:
            x = space_to_depth(x)
        out = ConvLayer(3, channels[self.size], 1,
                        name="conv_in")(x, s2d_in=s2d_n > 0)
        in_ch = channels[self.size]
        # s2d_in drives Python `if` control flow inside ResBlock/ConvLayer,
        # so under remat it must be a static argument (argnum 2 = after
        # self and x) and passed positionally, or tracing raises
        # TracerBoolConversionError.
        block_cls = (fnn.remat(ResBlock, static_argnums=(2,))
                     if self.remat else ResBlock)
        for idx, i in enumerate(range(log_size, 2, -1)):
            out_ch = channels[2 ** (i - 1)]
            use_s2d = idx < s2d_n
            if use_s2d and idx > 0:  # first octave arrives s2d from conv_in
                out = space_to_depth(out)
            out = block_cls(in_ch, out_ch, self.blur_kernel,
                            name=f"block_{log_size - i}")(out, use_s2d)
            in_ch = out_ch

        b, h, w, c = out.shape
        group = min(b, self.stddev_group)
        # the cross-sample statistic accumulates fp32 (bf16 variance of
        # near-equal values cancels catastrophically)
        stddev = out.astype(jnp.float32).reshape(
            group, -1, h, w, self.stddev_feat, c // self.stddev_feat)
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 4), keepdims=True)[..., 0]
        stddev = jnp.tile(stddev.reshape(-1, 1, 1, 1), (group, h, w, 1))
        out = jnp.concatenate([out, stddev.astype(out.dtype)], axis=-1)

        out = ConvLayer(in_ch + 1, channels[4], 3, name="final_conv")(out)
        # torch flattens NCHW (C,H,W) — transpose before reshape for parity.
        out = out.transpose(0, 3, 1, 2).reshape(b, -1)
        out = EqualLinear(channels[4] * 4 * 4, channels[4],
                          activation="fused_lrelu", name="final_linear1")(out)
        out = EqualLinear(channels[4], 1, name="final_linear2")(out)
        return out
