"""CLIP ViT-B/32 (image + text towers), TPU-native.

Architecture mirrors openai/CLIP's ``model.py`` (the reference loads it at
criteria/clip_loss.py:9); weights load through convert.clip from an OpenAI
state dict. Attention uses one fused QKV projection per block — a single
large matmul for the MXU — and the text tower's causal mask is additive,
matching torch's MultiheadAttention semantics.
"""

from __future__ import annotations

import math
from dataclasses import field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


def quick_gelu(x):
    return x * fnn.sigmoid(1.702 * x)


class MultiheadAttention(fnn.Module):
    """torch nn.MultiheadAttention-compatible (fused in_proj)."""
    width: int
    heads: int

    @fnn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # x: (B, L, D). in_proj weight stored (D, 3D) = torch (3D, D) transposed.
        w_in = self.param("in_proj_weight", fnn.initializers.lecun_normal(),
                          (self.width, 3 * self.width))
        b_in = self.param("in_proj_bias", fnn.initializers.zeros, (3 * self.width,))
        w_out = self.param("out_proj_weight", fnn.initializers.lecun_normal(),
                           (self.width, self.width))
        b_out = self.param("out_proj_bias", fnn.initializers.zeros, (self.width,))

        b, l, d = x.shape
        h = self.heads
        hd = d // h
        qkv = x @ w_in + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(b, l, h, hd).transpose(0, 2, 1, 3)  # (B,H,L,hd)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        att = att / math.sqrt(hd)
        if mask is not None:
            att = att + mask.astype(att.dtype)
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return out @ w_out + b_out


class ResidualAttentionBlock(fnn.Module):
    width: int
    heads: int

    @fnn.compact
    def __call__(self, x, mask=None):
        x = x + MultiheadAttention(self.width, self.heads, name="attn")(
            fnn.LayerNorm(epsilon=1e-5, name="ln_1")(x), mask)
        h = fnn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = fnn.Dense(self.width * 4, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = fnn.Dense(self.width, name="mlp_c_proj")(h)
        return x + h


class _BlockCell(fnn.Module):
    """Scan cell wrapping one residual block (mask broadcast, no per-step
    input)."""
    width: int
    heads: int

    @fnn.compact
    def __call__(self, carry, _):
        x, mask = carry
        x = ResidualAttentionBlock(self.width, self.heads,
                                   name="blk")(x, mask)
        return (x, mask), None


class Transformer(fnn.Module):
    """Stack of residual attention blocks, run as ONE nn.scan over stacked
    params — 12 block bodies collapse to one in HLO, cutting XLA compile
    time several-fold with identical numerics (weights stack along axis 0,
    see convert.clip)."""
    width: int
    layers: int
    heads: int

    @fnn.compact
    def __call__(self, x, mask=None):
        Scan = fnn.scan(_BlockCell,
                        variable_axes={"params": 0},
                        split_rngs={"params": True},
                        length=self.layers)
        (x, _), _ = Scan(self.width, self.heads, name="blocks")((x, mask),
                                                                None)
        return x


class VisionTransformer(fnn.Module):
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @fnn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized image → (B, output_dim)."""
        scale = self.width ** -0.5
        n_patches = (self.input_resolution // self.patch_size) ** 2

        w_conv = self.param(
            "conv1_weight", fnn.initializers.lecun_normal(),
            (self.patch_size, self.patch_size, 3, self.width),
        )
        patches = jax.lax.conv_general_dilated(
            x, w_conv.astype(x.dtype),
            (self.patch_size, self.patch_size), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = patches.shape[0]
        patches = patches.reshape(b, n_patches, self.width)

        cls = self.param("class_embedding",
                         fnn.initializers.normal(scale), (self.width,))
        pos = self.param("positional_embedding",
                         fnn.initializers.normal(scale),
                         (n_patches + 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(patches.dtype),
             patches], axis=1)
        x = x + pos.astype(x.dtype)
        x = fnn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        x = Transformer(self.width, self.layers, self.heads,
                        name="transformer")(x)
        x = fnn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0, :])
        proj = self.param("proj", fnn.initializers.normal(scale),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)


class TextTransformer(fnn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512

    @fnn.compact
    def __call__(self, tokens):
        """tokens: (B, 77) int32 → (B, output_dim), read at the EOT position
        (argmax over token ids, openai CLIP model.py convention)."""
        emb = self.param("token_embedding", fnn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("positional_embedding", fnn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = emb[tokens] + pos
        mask = jnp.full((self.context_length, self.context_length), -jnp.inf)
        mask = jnp.triu(mask, k=1)
        x = Transformer(self.width, self.layers, self.heads,
                        name="transformer")(x, mask)
        x = fnn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection",
                          fnn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)


class CLIP(fnn.Module):
    """ViT-B/32 CLIP: encode_image / encode_text / similarity logits."""
    embed_dim: int = 512
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    vision_heads: Optional[int] = None

    def setup(self):
        self.visual = VisionTransformer(
            input_resolution=self.image_resolution,
            patch_size=self.vision_patch_size,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_heads or self.vision_width // 64,
            output_dim=self.embed_dim,
        )
        self.text = TextTransformer(
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            width=self.text_width,
            layers=self.text_layers,
            heads=self.text_heads,
            output_dim=self.embed_dim,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(math.log(1 / 0.07), jnp.float32),
        )

    def encode_image(self, image):
        return self.visual(image)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, image, tokens):
        img = self.encode_image(image)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


# torch-pixel preprocessing constants (openai CLIP _transform)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB NHWC → CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std
