"""Fused bias + LeakyReLU + sqrt(2) gain.

Reference: models/stylegan2/op/fused_act.py:23-39 (bias broadcasts over the
channel dim; the reference special-cases NCHW vs channel-last — in NHWC the
channel is always last so a single broadcast suffices). XLA fuses this chain
into the producing matmul/conv, so no Pallas kernel is needed; kept as one
function so the whole framework shares a single definition.
"""

import math

import jax.numpy as jnp


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jnp.ndarray:
    """out = leaky_relu(x + bias) * scale, bias broadcast along the last axis."""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale
