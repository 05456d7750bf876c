"""Phase-1 semantic-region discovery (k-means over synthesis features).

Reference: attention/clustering_feature.py:347-398 (feature collection +
sklearn KMeans) and the in-mapper assignment (run_attention.py:775-794).

TPU-native split: feature construction and assignment are jitted device code;
the k-means *fit* over the tiny (N·H·W, 576) matrix runs either through
sklearn on the host (bit-matching the reference, random_state=42) or a pure
JAX Lloyd iteration (``kmeans_fit``) when sklearn is unavailable or the fit
should stay on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.editing.modules import pairwise_distance
from where2edit_tpu.ops.interpolate import interpolate_bilinear


def _position_grids(size: int, dtype=jnp.float32):
    r = jnp.arange(size, dtype=dtype) * 2.0 / float(size - 1) - 1.0
    x_pos = jnp.broadcast_to(r[None, :], (size, size))
    y_pos = jnp.broadcast_to(r[:, None], (size, size))
    return x_pos, y_pos


def cluster_features(blend_feature: jnp.ndarray, *, upsample2: bool = False
                     ) -> jnp.ndarray:
    """(B, H, W, C) feature tap → (B·S·S, C + 2·(C//16)) clustering matrix.

    ``upsample2=True`` reproduces phase-1 collection (bilinear ×2,
    clustering_feature.py:373-386); False reproduces the in-mapper assignment
    features (run_attention.py:775-791).
    """
    b, h, w, c = blend_feature.shape
    if upsample2:
        size = h * 2
        feat = interpolate_bilinear(blend_feature, size, align_corners=True)
    else:
        size = h
        feat = blend_feature
    pc = c // 16
    x_pos, y_pos = _position_grids(size, feat.dtype)
    x_pos = jnp.broadcast_to(x_pos[None, :, :, None], (b, size, size, pc))
    y_pos = jnp.broadcast_to(y_pos[None, :, :, None], (b, size, size, pc))
    concat = jnp.concatenate([feat, x_pos, y_pos], axis=-1)
    return concat.reshape(-1, c + 2 * pc)


def assign_clusters(blend_feature: jnp.ndarray, centers: jnp.ndarray,
                    *, offset_per_sample: bool = True) -> jnp.ndarray:
    """Nearest-center ids (B, S, S), offset by sample·K like the reference
    (run_attention.py:793)."""
    b, h, w, _ = blend_feature.shape
    k = centers.shape[0]
    feats = cluster_features(blend_feature)
    dis = pairwise_distance(feats, centers.astype(feats.dtype))
    ids = jnp.argmin(dis, axis=1).reshape(b, h, w).astype(jnp.int32)
    if offset_per_sample:
        ids = ids + (jnp.arange(b, dtype=jnp.int32) * k)[:, None, None]
    return ids


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def _lloyd(data: jnp.ndarray, init_centers: jnp.ndarray, num_clusters: int,
           num_iters: int):
    def step(centers, _):
        d = pairwise_distance(data, centers)
        ids = jnp.argmin(d, axis=1)
        sums = jax.ops.segment_sum(data, ids, num_segments=num_clusters)
        counts = jax.ops.segment_sum(jnp.ones((data.shape[0],), data.dtype),
                                     ids, num_segments=num_clusters)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where((counts > 0)[:, None], new, centers)
        return new, None

    centers, _ = jax.lax.scan(step, init_centers, None, length=num_iters)
    return centers


def kmeans_fit(data, num_clusters: int = 10, *, seed: int = 42,
               num_iters: int = 50, use_sklearn: str = "auto",
               backend: str | None = None) -> np.ndarray:
    """Fit cluster centers.

    Backends:
      * 'sklearn' — bit-matches the reference (KMeans(random_state=42),
        clustering_feature.py:394);
      * 'native'  — multithreaded C++ Lloyd (native/w2e_native.cpp), the
        fast path for the production-sized (N·H·W, 576) matrices;
      * 'jax'     — on-device Lloyd (lax.scan).
    Default ('auto' / use_sklearn='auto'): sklearn for parity, falling back
    to native, then jax.
    """
    data_np = np.asarray(data, dtype=np.float32)
    backend = backend or ("sklearn" if use_sklearn in ("auto", "force")
                          else "jax")

    if backend == "native" or (backend == "sklearn" and use_sklearn != "force"):
        if backend == "native":
            from where2edit_tpu.utils.native import kmeans_fit_native  # noqa: PLC0415

            out = kmeans_fit_native(data_np, num_clusters,
                                    max_iters=num_iters, seed=seed)
            if out is not None:
                return out[0]
            backend = "sklearn"
    if backend == "sklearn":
        try:
            from sklearn.cluster import KMeans  # noqa: PLC0415

            km = KMeans(n_clusters=num_clusters, random_state=seed).fit(data_np)
            return km.cluster_centers_.astype(np.float32)
        except ImportError:
            if use_sklearn == "force":
                raise
            from where2edit_tpu.utils.native import kmeans_fit_native  # noqa: PLC0415

            out = kmeans_fit_native(data_np, num_clusters,
                                    max_iters=num_iters, seed=seed)
            if out is not None:
                return out[0]
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, data_np.shape[0], (num_clusters,),
                            replace=False)
    init = jnp.asarray(data_np)[idx]
    centers = _lloyd(jnp.asarray(data_np), init, num_clusters, num_iters)
    return np.asarray(centers)
