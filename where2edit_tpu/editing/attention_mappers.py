"""Where2edit region-attention mapper family.

Reference: attention/run_attention.py:45-893 (13 nets; the two production
ones are ``FullSpaceMapperFEATClusterLin_Net`` for W+ and
``FullSpaceMapperFEATClusterLinStyle_Net`` for S-space) plus the demo twin
``show_demo/utils_demo.py:11-139`` (same S-space net with a runtime
``strength_alpha`` and a pooled/raw map switch — folded here as arguments).

API deviation (documented): the reference concatenates CLIP text features
onto the latents *outside* the mapper and slices them back apart inside; here
the mappers take ``(text_features, latents, ...)`` directly — mathematically
identical, and it keeps XLA from materializing the concat.

TPU-first notes:
  * cluster-region pooling is one ``segment_sum`` pair (ops.segment), not the
    reference's O(batch·clusters) boolean-mask loop (run_attention.py:855-873)
  * cluster assignment (pairwise argmin) rides the MXU via the expanded
    |a|²-2ab+|b|² form and sits under stop_gradient, matching the reference's
    torch.no_grad block (run_attention.py:775-794)
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

from where2edit_tpu.editing.clustering import assign_clusters
from where2edit_tpu.editing.masks import finalize_attention_map
from where2edit_tpu.editing.modules import (
    AddNoise,
    CANet,
    GumbelSoftmax,
    kl_loss,
)
from where2edit_tpu.nn.layers import EqualConv2d, EqualLinear, StyledConv, pixel_norm
from where2edit_tpu.ops.interpolate import interpolate_nearest
from where2edit_tpu.ops.segment import cluster_coverage_penalty, segment_mean_map

# Reference tables at 1024px (kept verbatim for parity/conversion):
# run_attention.py:379 — W+ row that owns each feature tap (1-based layers)
W_CODE_NUM = [0, 1, 1, 2, 3, 3, 4, 5, 5, 6, 7, 7, 8, 9, 9, 10, 11, 11, 12,
              13, 13, 14, 15, 15, 16, 17, 18]
# run_attention.py:378 — non-to_rgb feature-tap indices
LAYER_NUM = [0, 2, 3, 5, 6, 8, 9, 11, 12, 14, 15, 17, 18, 20, 21, 23, 24]
# run_attention.py:711 — style-vector index owning each tap layer
STYLE_LAYERS = [0, 2, 2, 3, 5, 5, 6, 8, 8, 9, 11, 11, 12, 14, 14, 15, 17, 17,
                18, 20, 20, 21, 23, 23, 24, 26, 26]


def attention_tables(size: int, channel_multiplier: int = 2):
    """Geometry tables for any generator size (matches the reference's
    hard-coded 1024 lists; derived from the tap schedule in
    models/stylegan2.py).

    Returns dict with: n_taps, layer_num, w_code_num, style_layers,
    wplus_dims (channels of non-rgb taps), tap_channels (channels of every
    tap incl. to_rgbs), stylespace_dims (width of each style vector).
    """
    from where2edit_tpu.models.stylegan2 import channel_table

    log_size = int(math.log2(size))
    n_oct = log_size - 3 + 1
    n_taps = 2 + 3 * n_oct
    n_latent = 2 * log_size - 2
    ch = channel_table(channel_multiplier)

    layer_num = [i for i in range(n_taps) if i % 3 != 1]
    w_code_num = [0, 1, 1]
    style_layers = [0, 2, 2]
    for k in range(n_oct):
        w_code_num += [2 * k + 2, 2 * k + 3, 2 * k + 3]
        style_layers += [3 * k + 3, 3 * k + 5, 3 * k + 5]
    w_code_num[-1] = n_latent  # reference tail quirk (run_attention.py:379)

    tap_channels = [ch[4], 3]
    wplus_dims = [ch[4]]
    stylespace_dims = [ch[4], ch[4]]
    for k in range(n_oct):
        res = 2 ** (k + 3)
        tap_channels += [ch[res], ch[res], 3]
        wplus_dims += [ch[res], ch[res]]
        stylespace_dims += [ch[res // 2], ch[res], ch[res]]

    return {
        "n_taps": n_taps,
        "n_latent": n_latent,
        "layer_num": layer_num,
        "w_code_num": w_code_num,
        "style_layers": style_layers,
        "wplus_dims": wplus_dims,
        "tap_channels": tap_channels,
        "stylespace_dims": stylespace_dims,
    }


def tap_controls(size: int, attention_layer: int,
                 cluster_layer: Optional[int] = None,
                 channel_multiplier: int = 2):
    """Static capture controls ``(tap_subsample, tap_indices)`` for any
    synthesis pass whose taps feed this mapper family: keep the non-to_rgb
    mapper taps, the masked-blend taps, and (when given) the
    cluster-assignment tap; emit them at the larger of the blend / cluster
    resolutions. Exact for every consumer — the attention convs are
    pointwise (conv∘subsample ≡ subsample∘conv), the blend taps sit at
    blend resolution, and the cluster tap stays native-res because the
    cluster resolution bounds the subsample.

    Single source of truth for EditSession._capture, the trainer's no-grad
    syntheses, and bench.py (these had drifted: the bench copy omitted the
    cluster tap and only worked because it pins cluster_layer ==
    attention_layer).
    """
    from where2edit_tpu.models.stylegan2 import blend_tap_indices  # noqa: PLC0415

    keep = set(attention_tables(size, channel_multiplier)["layer_num"])
    keep |= set(blend_tap_indices(attention_layer))
    sub = tap_resolution(attention_layer)  # res of tap attention_layer-1
    if cluster_layer is not None:
        keep.add(cluster_layer - 1)
        sub = max(sub, tap_resolution(cluster_layer))
    return sub, tuple(sorted(keep))


def tap_resolution(layer: int) -> int:
    """Spatial resolution of feature tap ``layer - 1`` (1-based layer).

    Tap schedule: [4, 4, then 3 taps per octave] → e.g. 64 for layer 13,
    matching the reference's hard-coded 64² blend/label resolution
    (run_attention.py:794, utils.py:669-671). Single source of truth for
    tap_controls and the IoU evaluation harness."""
    return 4 * 2 ** (layer // 3)


def wplus_dim_table(channel_multiplier: int = 2) -> list[int]:
    """run_attention.py:377 — channels of feature_map[LAYER_NUM[c]] (1024px)."""
    cm = channel_multiplier
    return ([512] * 7 + [256 * cm] * 2 + [128 * cm] * 2 + [64 * cm] * 2
            + [32 * cm] * 2 + [16 * cm] * 2)


def style_dim_table(channel_multiplier: int = 2) -> list[int]:
    """run_attention.py:709 — per-style-vector widths (27 entries, 1024px)."""
    cm = channel_multiplier
    return ([512] * 12 + [256 * cm] * 3 + [128 * cm] * 3 + [64 * cm] * 3
            + [32 * cm] * 3 + [16 * cm] * 3)


class MapperOutput(NamedTuple):
    latents: Any                    # W+ delta (B,L,512) or list[(B,C)] styles
    attention_map: Optional[jnp.ndarray]  # (B, size, size, 1) or None
    loss_delta: jnp.ndarray
    loss_reg: jnp.ndarray
    loss_tv: jnp.ndarray

    @property
    def losses(self):
        return [self.loss_delta, self.loss_reg, self.loss_tv]


def _zero():
    return jnp.zeros(())


def _conv_then_resize(conv_fn, feature, size: int):
    """Apply a POINTWISE (1x1) conv and nearest-resize to ``size`` in the
    cheaper order. Nearest resize selects pixels, so it commutes exactly
    with any per-pixel map: for taps larger than the target, subsampling
    first skips full-resolution conv work (the reference convs at full res
    then downsamples, run_attention.py:550-551)."""
    if feature.shape[1] > size:
        return conv_fn(interpolate_nearest(feature, size))
    return interpolate_nearest(conv_fn(feature), size)


# --------------------------------------------------------------------------
# building-block mappers (run_attention.py:45-163)
# --------------------------------------------------------------------------

class MapperNet(fnn.Module):
    """PixelNorm + 4 fused-lrelu EqualLinears (run_attention.py:45-69)."""
    in_dim: int = 512
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, x):
        x = pixel_norm(x)
        for i in range(4):
            d_in = self.in_dim if i == 0 else self.latent_dim
            x = EqualLinear(d_in, self.latent_dim, lr_mul=0.01,
                            activation="fused_lrelu", name=f"fc_{i}")(x)
        return x


class MapperConNet(fnn.Module):
    """Separate text/latent branches + joint head (run_attention.py:72-131)."""
    in_dim: int = 512
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text, latent):
        t = pixel_norm(text)
        for i in range(2):
            d_in = self.in_dim - self.latent_dim if i == 0 else self.latent_dim
            t = EqualLinear(d_in, self.latent_dim, lr_mul=0.01,
                            activation="fused_lrelu", name=f"text_{i}")(t)
        z = pixel_norm(latent)
        for i in range(2):
            z = EqualLinear(self.latent_dim, self.latent_dim, lr_mul=0.01,
                            activation="fused_lrelu", name=f"latent_{i}")(z)
        x = jnp.concatenate([t, z], axis=-1)
        for i in range(2):
            d_in = 2 * self.latent_dim if i == 0 else self.latent_dim
            x = EqualLinear(d_in, self.latent_dim, lr_mul=0.01,
                            activation="fused_lrelu", name=f"together_{i}")(x)
        return x


class MapperConLinNet(fnn.Module):
    """PixelNorm both inputs, single linear head (run_attention.py:134-163)."""
    in_dim: int = 512
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text, latent):
        x = jnp.concatenate([pixel_norm(text), pixel_norm(latent)], axis=-1)
        return EqualLinear(self.in_dim, self.latent_dim, lr_mul=0.1,
                           name="together")(x)


# --------------------------------------------------------------------------
# W+ full-space families
# --------------------------------------------------------------------------

def _per_row(x):  # (B, L, D) → iterate rows keeping (B, 1, D)
    return [x[:, c: c + 1, :] for c in range(x.shape[1])]


class FullSpaceMapper(fnn.Module):
    """One MapperNet per W+ row (run_attention.py:166-185)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text_features, latent) -> MapperOutput:
        x = jnp.concatenate(
            [jnp.repeat(text_features[:, None, :], latent.shape[1], 1), latent],
            axis=-1)
        out = [MapperNet(self.in_dim, self.latent_dim, name=f"mapper_{c}")(row)
               for c, row in enumerate(_per_row(x))]
        delta = jnp.concatenate(out, axis=1)
        loss_delta = jnp.mean(jnp.linalg.norm(delta, axis=-1))
        return MapperOutput(delta, None, loss_delta, _zero(), _zero())


class FullSpaceMapperCon(fnn.Module):
    """run_attention.py:188-207."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text_features, latent) -> MapperOutput:
        t = text_features[:, None, :]
        out = [MapperConNet(self.in_dim, self.latent_dim, name=f"mapper_{c}")(
            t, row) for c, row in enumerate(_per_row(latent))]
        delta = jnp.concatenate(out, axis=1)
        loss_delta = jnp.mean(jnp.linalg.norm(delta, axis=-1))
        return MapperOutput(delta, None, loss_delta, _zero(), _zero())


class FullSpaceMapperAtt(fnn.Module):
    """Sigmoid per-row gates from text (run_attention.py:210-255)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text_features, latent, train: bool = False) -> MapperOutput:
        a = pixel_norm(text_features)
        a = EqualLinear(self.in_dim - self.latent_dim, self.latent_dim,
                        lr_mul=0.01, activation="fused_lrelu", name="att_0")(a)
        a = EqualLinear(self.latent_dim, self.layers, lr_mul=0.01,
                        name="att_1")(a)
        a = AddNoise(0.5, name="att_noise")(a, train=train)
        attention = fnn.sigmoid(a)
        t = text_features[:, None, :]
        out = []
        for c, row in enumerate(_per_row(latent)):
            r = MapperConNet(self.in_dim, self.latent_dim,
                             name=f"mapper_{c}")(t, row)
            out.append(r * attention[:, c][:, None, None])
        delta = jnp.concatenate(out, axis=1)
        loss_att = 0.25 - jnp.mean(jnp.square(attention - 0.5))
        return MapperOutput(delta, None, loss_att, _zero(), _zero())


class FullSpaceMapperAttLin(fnn.Module):
    """Gumbel one-hot row gates (run_attention.py:258-297)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text_features, latent, train: bool = False) -> MapperOutput:
        a = pixel_norm(text_features)
        a = EqualLinear(self.in_dim - self.latent_dim, self.layers,
                        lr_mul=1.0, name="att_0")(a)
        a = jnp.maximum(a, 0.0)
        attention = GumbelSoftmax(1.0, name="att_gumbel")(a, train=train)
        t = text_features[:, None, :]
        out = [MapperConLinNet(self.in_dim, self.latent_dim,
                               name=f"mapper_{c}")(t, row)
               for c, row in enumerate(_per_row(latent))]
        delta = jnp.concatenate(out, axis=1)
        loss_delta = jnp.mean(jnp.linalg.norm(delta, axis=-1))
        delta = delta * attention[:, :, None]
        return MapperOutput(delta, None, loss_delta, _zero(), _zero())


class FullSpaceMapperSpatialLin(fnn.Module):
    """First spatial-attention variant (run_attention.py:300-369)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text_features, latent, feature_map, size: int,
                 train: bool = False) -> MapperOutput:
        dim = [512] * 7 + [256] * 2 + [128] * 2 + [64] * 2
        layer_num = [0, 2, 3, 5, 6, 8, 9, 11, 12, 14, 15, 17, 18]
        t = text_features[:, None, :]
        out, att_feats = [], []
        for c, row in enumerate(_per_row(latent)):
            out.append(MapperConLinNet(self.in_dim, self.latent_dim,
                                       name=f"mapper_{c}")(t, row))
            if c < latent.shape[1] - 1:
                att_feats.append(_conv_then_resize(
                    EqualConv2d(dim[c], 32, 1, name=f"attention_{c}"),
                    feature_map[layer_num[c]], size))
        delta = jnp.concatenate(out, axis=1)
        loss_delta = jnp.mean(jnp.linalg.norm(delta, axis=-1))

        amap = jnp.concatenate(att_feats, axis=-1)
        amap = EqualConv2d(32 * (self.layers - 1), self.latent_dim, 1,
                           name="attention_last")(amap)
        amap = amap / jnp.linalg.norm(amap, axis=-1, keepdims=True)
        proj = EqualLinear(self.latent_dim, self.latent_dim, lr_mul=1.0,
                           name="proj_text")(text_features)
        proj = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
        amap = 0.5 * (jnp.sum(proj[:, None, None, :] * amap, axis=-1,
                              keepdims=True) + 1.0)

        small, big = size // 4, 3 * size // 4
        weight = jnp.ones_like(amap)
        weight = weight.at[:, small:big, small:big, :].set(0.5)
        loss_reg = jnp.mean(weight * amap)
        tv = (jnp.linalg.norm((amap[:, 1:] - amap[:, :-1]).reshape(-1))
              + jnp.linalg.norm((amap[:, :, 1:] - amap[:, :, :-1]).reshape(-1)))
        return MapperOutput(delta, amap, loss_delta, loss_reg, tv)


class _Conv1x1Params(fnn.Module):
    """Parameter holder with EqualConv2d's exact 1x1 param layout/init
    (weight (1,1,in,out) ~ N(0,1), bias const) — same checkpoint tree, but
    the weights are returned (equalized-LR pre-scaled) instead of applied,
    so callers can compose consecutive 1x1 convs into one kernel."""
    in_channel: int
    out_channel: int
    bias_init: float = 0.0

    @fnn.compact
    def __call__(self):
        w = self.param("weight", fnn.initializers.normal(1.0),
                       (1, 1, self.in_channel, self.out_channel))
        b = self.param("bias", fnn.initializers.constant(self.bias_init),
                       (self.out_channel,))
        return w[0, 0] * (1.0 / math.sqrt(self.in_channel)), b


class _FeatAttentionTrunk(fnn.Module):
    """Shared W+ FEAT attention branch (run_attention.py:395-446 / 465-559).

    The reference runs one C_tap→32 1x1 conv per tap, concatenates the
    17x32-channel maps and applies a 544→1 conv. Both convs are linear, and
    nearest resize commutes with pointwise convs, so the whole trunk
    composes exactly into one C_tap→1 conv per tap + a sum:

        logits = Σ_c resize(x_c) @ (s_c W_c · s_L W_L[c-block]) + bias_eff

    32x fewer MACs, no 544-channel concat intermediate, identical params
    (same tree as the unfused EqualConv2d form → converters unchanged) and
    identical gradients (same function of the same parameters)."""
    layers: int
    channel_multiplier: int = 2
    generator_size: int = 1024

    @fnn.compact
    def __call__(self, feature_map, size: int):
        tables = attention_tables(self.generator_size, self.channel_multiplier)
        dim = tables["wplus_dims"]
        layer_num = tables["layer_num"]
        # reference inits the head bias to 5 (run_attention.py:404,478)
        w_last, b_last = _Conv1x1Params(32 * self.layers, 1, bias_init=5.0,
                                        name="attention_last")()
        taps = [(feature_map[-1], dim[0], "attention_first")]
        taps += [(feature_map[layer_num[c]], dim[c], f"attention_{c}")
                 for c in range(self.layers - 1)]
        logits = None
        bias_eff = b_last.astype(jnp.float32)
        for idx, (feat, d, name) in enumerate(taps):
            w, b = _Conv1x1Params(d, 32, name=name)()
            w_l = w_last[idx * 32:(idx + 1) * 32]          # (32, 1)
            w_eff = w @ w_l                                 # (C_tap, 1)
            bias_eff = bias_eff + b @ w_l
            if feat.shape[1] > size:
                feat = interpolate_nearest(feat, size)
            y = jnp.einsum("bhwc,co->bhwo", feat, w_eff.astype(feat.dtype))
            if y.shape[1] < size:
                y = interpolate_nearest(y, size)
            logits = y if logits is None else logits + y
        return logits + bias_eff.astype(logits.dtype)


class FullSpaceMapperFEATLin(fnn.Module):
    """W+ deltas below the attention layer + spatial map (run_attention.py:372-446)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512
    attention_layer: int = 11
    channel_multiplier: int = 2
    generator_size: int = 1024

    @property
    def mapper_layer(self) -> int:
        return attention_tables(self.generator_size,
                                self.channel_multiplier)["w_code_num"][
            self.attention_layer]

    @fnn.compact
    def __call__(self, text_features, latent, feature_map, size: int,
                 train: bool = False, attention_text=None) -> MapperOutput:
        del text_features, attention_text  # deltas are latent-only (ref :415)
        out = []
        for c, row in enumerate(_per_row(latent)):
            if c < self.mapper_layer:
                x = pixel_norm(row)
                for i in range(3):
                    x = EqualLinear(self.latent_dim, self.latent_dim,
                                    lr_mul=0.1, activation="fused_lrelu",
                                    name=f"mapper_{c}_fc_{i}")(x)
                out.append(x)
            else:
                out.append(jnp.zeros_like(row))
        delta = jnp.concatenate(out, axis=1)
        loss_delta = jnp.mean(
            jnp.linalg.norm(delta[:, : self.mapper_layer], axis=-1))

        logits = _FeatAttentionTrunk(self.layers, self.channel_multiplier,
                                     self.generator_size,
                                     name="att")(feature_map, size)
        amap = fnn.sigmoid(logits)
        tv = jnp.mean(
            jnp.linalg.norm(amap[:, 1:] - amap[:, :-1], axis=(1, 2))
            / float((size - 1) * size)
            + jnp.linalg.norm(amap[:, :, 1:] - amap[:, :, :-1], axis=(1, 2))
            / float(size * (size - 1)))
        final = jnp.where(amap < 0.8, amap - jax.lax.stop_gradient(amap), amap)
        loss_reg = jnp.mean(final)
        return MapperOutput(delta, final, loss_delta, loss_reg, tv)


class FullSpaceMapperFEATClusterLin(fnn.Module):
    """Production W+ mapper (run_attention.py:449-595): FEAT deltas +
    cluster-pooled attention map."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512
    attention_layer: int = 11
    cluster_layer: int = 11
    channel_multiplier: int = 2
    clusters: int = 10
    # full center width incl. position channels (512 + 2·32 for layer-13
    # features; the reference reads it off the pickle, run_attention.py:1003)
    cluster_dim: int = 576
    coverage_threshold: float = 0.8  # ref :570
    generator_size: int = 1024

    @property
    def mapper_layer(self) -> int:
        return attention_tables(self.generator_size,
                                self.channel_multiplier)["w_code_num"][
            self.attention_layer]

    def setup(self):
        self.initial_state = self.variable(
            "clusters", "initial_state",
            lambda: jnp.zeros((self.clusters, self.cluster_dim), jnp.float32))
        self.att = _FeatAttentionTrunk(self.layers, self.channel_multiplier,
                                       self.generator_size, name="att")
        mappers = {}
        for c in range(self.mapper_layer):
            mappers[c] = [
                EqualLinear(self.latent_dim, self.latent_dim, lr_mul=0.1,
                            activation="fused_lrelu", name=f"mapper_{c}_fc_{i}")
                for i in range(3)
            ]
        self._mappers = mappers

    def __call__(self, text_features, latent, feature_map, size: int,
                 train: bool = True, attention_text=None) -> MapperOutput:
        del text_features, attention_text
        batch = latent.shape[0]
        blend_feature = feature_map[self.cluster_layer - 1]
        size = blend_feature.shape[1]  # ref :510 overrides the passed size
        ids = jax.lax.stop_gradient(
            assign_clusters(jax.lax.stop_gradient(blend_feature),
                            self.initial_state.value))

        out = []
        for c in range(latent.shape[1]):
            row = latent[:, c: c + 1, :]
            if c < self.mapper_layer:
                x = pixel_norm(row)
                for layer in self._mappers[c]:
                    x = layer(x)
                out.append(x)
            else:
                out.append(jnp.zeros_like(row))
        delta = jnp.concatenate(out, axis=1)
        loss_delta = jnp.mean(
            jnp.linalg.norm(delta[:, : self.mapper_layer], axis=-1))

        logits = self.att(feature_map, size)
        each = fnn.sigmoid(logits)[..., 0]

        if train:
            pooled, means, counts = segment_mean_map(
                each, ids, batch * self.clusters)
            amap = pooled[..., None]
            loss_reg = cluster_coverage_penalty(
                means, counts, batch, self.coverage_threshold)
        else:
            amap = each[..., None]
            loss_reg = _zero()
        loss_tv = jnp.mean(
            jnp.square(each[..., None] - jax.lax.stop_gradient(amap)))
        final = finalize_attention_map(amap, 0.8)
        return MapperOutput(delta, final, loss_delta, loss_reg, loss_tv)


# --------------------------------------------------------------------------
# S-space families
# --------------------------------------------------------------------------

class FullSpaceMapperAttLinStyle(fnn.Module):
    """Per-style residual with sigmoid strength gates (run_attention.py:598-642)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512

    @fnn.compact
    def __call__(self, text_features, styles: Sequence[jnp.ndarray],
                 train: bool = False) -> MapperOutput:
        total_layers = self.layers + int((self.layers - 2) * 0.5)
        dim = [512] * 12 + [256] * 3 + [128] * 3 + [64] * 2
        a = pixel_norm(text_features)
        a = EqualLinear(self.in_dim - self.latent_dim, total_layers,
                        lr_mul=1.0, name="att_0")(a)
        a = AddNoise(0.5, name="att_noise")(a, train=train)
        attention = fnn.sigmoid(a)

        t = text_features[:, None, :]
        out = []
        loss_delta = _zero()
        for c, s in enumerate(styles):
            row = s[:, None, :]
            res = MapperConLinNet(
                self.in_dim - self.latent_dim + dim[c], dim[c],
                name=f"mapper_{c}")(t, row)
            loss_delta = loss_delta + jnp.mean(jnp.linalg.norm(res, axis=-1))
            strength = attention[:, c][:, None, None]
            if train:
                key = self.make_rng("noise")
                jitter = 1 + 0.2 * jax.random.uniform(key, (s.shape[0], 1, 1))
                strength = strength * jitter
            out.append((row + strength * res)[:, 0, :])
        return MapperOutput(out, None, loss_delta / float(len(styles)),
                            _zero(), _zero())


class FullSpaceMapperFEATLinStyle(fnn.Module):
    """S-space residuals + spatial map, no clusters (run_attention.py:645-700)."""
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512
    attention_layer: int = 11
    channel_multiplier: int = 2

    generator_size: int = 1024

    @fnn.compact
    def __call__(self, text_features, styles: Sequence[jnp.ndarray],
                 feature_map, size: int, train: bool = False,
                 attention_text=None,
                 deterministic_noise: bool = False) -> MapperOutput:
        # deterministic_noise accepted for API uniformity with the cluster
        # variant (this net draws no noise)
        del text_features, deterministic_noise  # deltas are style-only (ref :671)
        tables = attention_tables(self.generator_size, self.channel_multiplier)
        dim = tables["stylespace_dims"]
        tap_ch = tables["tap_channels"]
        layer_num = set(tables["layer_num"])
        mapper_layer = self.attention_layer  # ref :653 (not the style table)
        out, att_feats = [], []
        loss_delta = _zero()
        for c, s in enumerate(styles):
            row = s[:, None, :]
            if c < mapper_layer:
                x = pixel_norm(row)
                for i in range(2):
                    x = EqualLinear(dim[c], dim[c], lr_mul=10.0,
                                    activation="fused_lrelu",
                                    name=f"mapper_{c}_fc_{i}")(x)
                loss_delta = loss_delta + jnp.mean(
                    jnp.linalg.norm(x, axis=-1)) / float(mapper_layer)
                out.append((row + x)[:, 0, :])
            else:
                out.append(s)
            if c in layer_num:
                att_feats.append(_conv_then_resize(
                    EqualConv2d(tap_ch[c], 32, 1, name=f"attention_{c}"),
                    feature_map[c], size))
        amap = jnp.concatenate(att_feats, axis=-1)
        amap = EqualConv2d(32 * (self.layers - 1), 1, 1,
                           name="attention_last")(amap)
        amap = fnn.sigmoid(amap)
        loss_reg = jnp.mean(amap)
        tv = (jnp.linalg.norm((amap[:, 1:] - amap[:, :-1]).reshape(-1))
              + jnp.linalg.norm((amap[:, :, 1:] - amap[:, :, :-1]).reshape(-1)))
        return MapperOutput(out, amap, loss_delta, loss_reg, tv)


class FullSpaceMapperFEATClusterLinStyle(fnn.Module):
    """Production S-space mapper (run_attention.py:703-893; demo twin
    show_demo/utils_demo.py:11-139).

    ``strength_alpha``: residual step size (training hard-codes 0.1,
    ref :823; the demo exposes it as a slider, utils_demo.py:89).
    ``pooled_map``: cluster-pooled map (training / demo mode 3) vs the raw
    per-pixel map (demo mode != 3).
    ``finalize``: apply ST-threshold+blur (training path, ref :882-884); the
    demo applies its own thresholding outside (utils_demo.py:154-155).
    """
    layers: int
    in_dim: int = 1024
    latent_dim: int = 512
    attention_layer: int = 11
    cluster_layer: int = 11
    channel_multiplier: int = 2
    clusters: int = 10
    cluster_dim: int = 576  # full center width incl. position channels
    coverage_threshold: float = 0.7  # ref :864
    generator_size: int = 1024

    @property
    def _tables(self):
        return attention_tables(self.generator_size, self.channel_multiplier)

    @property
    def mapper_layer(self) -> int:
        return self._tables["style_layers"][self.attention_layer]

    def setup(self):
        tables = self._tables
        dim = tables["stylespace_dims"]
        tap_ch = tables["tap_channels"]
        self.initial_state = self.variable(
            "clusters", "initial_state",
            lambda: jnp.zeros((self.clusters, self.cluster_dim), jnp.float32))
        mappers = {}
        for c in range(self.mapper_layer):
            mappers[c] = {
                "style": EqualLinear(dim[c], dim[c], bias_init=1.0,
                                     name=f"mapper_{c}"),
                "text": [
                    EqualLinear(self.latent_dim, (self.latent_dim + 512) // 2,
                                lr_mul=1.0, activation="fused_lrelu",
                                name=f"mapper_text_{c}_0"),
                    EqualLinear((self.latent_dim + 512) // 2, 512, lr_mul=1.0,
                                activation="fused_lrelu",
                                name=f"mapper_text_{c}_1"),
                ],
                "all": EqualLinear(dim[c] + 512, dim[c], bias_init=1.0,
                                   name=f"mapper_all_{c}"),
            }
        self._mappers = mappers
        atts = {}
        for c in tables["layer_num"]:
            atts[c] = {
                "textca": EqualLinear(self.latent_dim, tap_ch[c],
                                      bias_init=1.0, name=f"attention_textca_{c}"),
                "conv": StyledConv(tap_ch[c], 32, 1, tap_ch[c],
                                   name=f"attention_{c}"),
            }
        self._atts = atts
        self.attention_textca_first = EqualLinear(
            self.latent_dim, dim[0], bias_init=1.0, name="attention_textca_first")
        self.attention_first = StyledConv(dim[0], 32, 1, dim[0],
                                          name="attention_first")
        self.attention_textca_last = EqualLinear(
            self.latent_dim, 32 * self.layers, bias_init=1.0,
            name="attention_textca_last")
        self.attention_last = StyledConv(32 * self.layers, 1, 1,
                                         32 * self.layers, name="attention_last")
        self.initial_bias = self.param(
            "initial_bias", fnn.initializers.constant(5.0), (1,))

    def __call__(self, text_features, styles: Sequence[jnp.ndarray],
                 feature_map, size: int, attention_text=None,
                 train: bool = True, strength_alpha: float = 0.1,
                 pooled_map: bool = True, finalize: bool = True,
                 deterministic_noise: bool = False) -> MapperOutput:
        batch = styles[0].shape[0]
        x_text = text_features
        if attention_text is None:
            attention_text = x_text

        blend_feature = feature_map[self.cluster_layer - 1]
        ids = jax.lax.stop_gradient(
            assign_clusters(jax.lax.stop_gradient(blend_feature),
                            self.initial_state.value))
        if ids.shape[1] != size:
            # nearest-resize the id map to the blend size (ref :794)
            ids = interpolate_nearest(
                ids[..., None].astype(jnp.float32), size
            )[..., 0].astype(jnp.int32)

        def att_conv(conv, textca, feature, out_ch=32):
            s = textca(attention_text)
            # 1x1 conv commutes with the nearest resize — subsample first
            # for taps above the blend resolution (exact; see
            # _conv_then_resize)
            if feature.shape[1] > size:
                feature = interpolate_nearest(feature, size)
            # reference NoiseInjection draws fresh noise even at eval
            # (model.py:285-290); deterministic_noise pins it to zero for
            # reproducible inference/tests.
            nz = (jnp.zeros((feature.shape[0], feature.shape[1],
                             feature.shape[2], 1), feature.dtype)
                  if deterministic_noise else None)
            f, _ = conv(feature, s, input_is_stylespace=True, noise=nz)
            return interpolate_nearest(f, size)

        att_feats = [att_conv(self.attention_first,
                              self.attention_textca_first, feature_map[-1])]
        out = []
        loss_delta = _zero()
        for c, s in enumerate(styles):
            if c < self.mapper_layer:
                m = self._mappers[c]
                t_hidden = m["text"][1](m["text"][0](x_text))
                s_hidden = m["style"](s)
                joint = m["all"](jnp.concatenate([s_hidden, t_hidden], axis=-1))
                s_new = s + strength_alpha * (joint - s)
                loss_delta = loss_delta + jnp.mean(
                    jnp.linalg.norm(s_new - s, axis=-1)) / float(self.mapper_layer)
                out.append(s_new)
            else:
                out.append(s)
            if c in self._atts:
                a = self._atts[c]
                att_feats.append(att_conv(a["conv"], a["textca"],
                                          feature_map[c]))

        each = jnp.concatenate(att_feats, axis=-1)
        s_last = self.attention_textca_last(attention_text)
        nz_last = (jnp.zeros((batch, size, size, 1), each.dtype)
                   if deterministic_noise else None)
        each, _ = self.attention_last(each, s_last, input_is_stylespace=True,
                                      noise=nz_last)
        each = fnn.sigmoid(each + self.initial_bias)[..., 0]  # (B, size, size)

        pooled, means, counts = segment_mean_map(each, ids,
                                                 batch * self.clusters)
        loss_reg = cluster_coverage_penalty(means, counts, batch,
                                            self.coverage_threshold)
        amap = (pooled if pooled_map else each)[..., None]
        loss_tv = jnp.mean(jnp.square(each - jax.lax.stop_gradient(pooled)))

        final = finalize_attention_map(amap, 0.8) if finalize else amap
        return MapperOutput(out, final, loss_delta, loss_reg, loss_tv)
