"""Explicit collectives for shard_map contexts.

jax collectives are differentiable by construction, so the reference's
autograd-aware GatherLayer (utils.py:114-131) is just ``lax.all_gather``;
its backward (take your own shard of the incoming grads) is exactly
all_gather's transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_with_grad(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Differentiable global concat along the batch dim."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def broadcast_from_first(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """dist.broadcast(src=0) (run_attention.py:1143,1212-1229): every member
    gets member 0's value. Expressed as gather+index so XLA can fuse it."""
    gathered = jax.lax.all_gather(x, axis_name)  # (world, ...)
    return gathered[0]
