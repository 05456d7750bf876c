"""Attention-mask postprocessing.

The reference's data-dependent in-place updates become jnp.where +
stop_gradient compositions (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from where2edit_tpu.ops.gaussian_blur import gaussian_blur


def straight_through_threshold(m: jnp.ndarray, threshold: float = 0.8) -> jnp.ndarray:
    """``m[m<thr] = m - m.detach()`` (attention/run_attention.py:882-883):
    below-threshold entries become 0 in value but keep identity gradient."""
    return jnp.where(m < threshold, m - jax.lax.stop_gradient(m), m)


def finalize_attention_map(m: jnp.ndarray, threshold: float = 0.8,
                           blur_ksize: int = 5) -> jnp.ndarray:
    """ST-threshold then gaussian blur (run_attention.py:882-884). m: NHWC."""
    return gaussian_blur(straight_through_threshold(m, threshold), blur_ksize)


def demo_threshold(m: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Zero below threshold (show_demo/utils_demo.py:154)."""
    return jnp.where(m < threshold, 0.0, m)


def binarize_for_iou(m: jnp.ndarray) -> jnp.ndarray:
    """utils.py:649-651: <0.8 → 0 then >0.7 → 1 (net effect: hard 0/1 at 0.8)."""
    m = jnp.where(m < 0.8, 0.0, m)
    return jnp.where(m > 0.7, 1.0, m)
