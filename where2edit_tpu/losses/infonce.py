"""Global-batch InfoNCE consistency loss.

Reference: attention/run_attention.py:1312-1318 — per-rank CLIP features are
all-gathered *with gradient* (GatherLayer, utils.py:114-131), then
CE(img_norm @ cond_norm.T / 0.01, arange). In JAX the gather is
``lax.all_gather(..., tiled=True)``, differentiable by construction; outside
a pjit/shard_map context (axis_name=None) it degrades to the single-chip
loss, exactly like world_size == 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def infonce_consistency(image_features: jnp.ndarray,
                        cond_features: jnp.ndarray,
                        axis_name: Optional[str] = None,
                        temperature: float = 0.01) -> jnp.ndarray:
    if axis_name is not None:
        image_features = jax.lax.all_gather(image_features, axis_name,
                                            tiled=True)
        cond_features = jax.lax.all_gather(cond_features, axis_name,
                                           tiled=True)
    img = _normalize(image_features)
    cond = _normalize(cond_features)
    logits = (img @ cond.T) / temperature
    labels = jnp.arange(logits.shape[0])
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels))
