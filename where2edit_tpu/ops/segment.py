"""Cluster-region pooling via segment reductions.

The reference pools the attention map over k-means regions with a Python loop
of ``batch * clusters`` boolean-mask kernels (attention/run_attention.py:
855-873) — O(K) kernel launches and a full map read each. TPU-native version:
one ``segment_sum`` pair with a static segment count, then a gather. Empty
clusters (reference: NaN mean, skipped) get mean 0, which leaves the pooled
map untouched (no member pixels) and contributes relu(0 - thr) = 0 to the
coverage penalty — numerically identical behavior.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_segments",))
def segment_mean_map(values: jnp.ndarray, segment_ids: jnp.ndarray,
                     num_segments: int):
    """Replace every pixel with the mean of its segment.

    Args:
      values: (B, H, W) float map.
      segment_ids: (B, H, W) int32, already globally offset (b*clusters + k).
      num_segments: static B*clusters.
    Returns:
      (pooled_map (B,H,W), means (num_segments,), counts (num_segments,))

    For the small segment counts here (batch·clusters), both the reduction
    and the gather-back are expressed as one-hot matmuls — scatter/gather
    serialize on TPU, matmuls ride the MXU.
    """
    flat_v = values.reshape(-1).astype(jnp.float32)
    flat_i = segment_ids.reshape(-1)
    if num_segments <= 512:
        onehot = jax.nn.one_hot(flat_i, num_segments, dtype=jnp.float32)
        sums = flat_v @ onehot
        counts = jnp.sum(onehot, axis=0)
        means = sums / jnp.maximum(counts, 1.0)
        pooled = (onehot @ means).reshape(values.shape).astype(values.dtype)
        return pooled, means, counts
    sums = jax.ops.segment_sum(flat_v, flat_i, num_segments=num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones_like(flat_v), flat_i, num_segments=num_segments
    )
    means = sums / jnp.maximum(counts, 1.0)
    pooled = means[flat_i].reshape(values.shape).astype(values.dtype)
    return pooled, means, counts


def cluster_coverage_penalty(means: jnp.ndarray, counts: jnp.ndarray,
                             batch: int, threshold: float = 0.7) -> jnp.ndarray:
    """sum_k relu(mean_k - threshold) averaged over the batch.

    Reference: attention/run_attention.py:864-874 (threshold 0.7 for the
    S-space production mapper; 0.8 for the W+ variant, run_attention.py:570).
    Empty clusters are excluded exactly as the reference's isnan skip.
    """
    valid = counts > 0
    per_seg = jnp.where(valid, jax.nn.relu(means - threshold), 0.0)
    return jnp.sum(per_seg) / float(batch)
