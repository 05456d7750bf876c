"""ArcFace identity loss (criteria/id_loss.py:7-40)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from where2edit_tpu.ops.interpolate import adaptive_avg_pool


class IDLoss:
    def __init__(self, facenet, facenet_variables):
        self.facenet = facenet
        self.variables = facenet_variables

    def apply_extract_feats(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) → l2-normed 512-d: pool to 256², crop the face box
        [35:223, 32:220], pool to 112² (id_loss.py:18-24). Variables are
        explicit so outer jitted steps can pass them as arguments (weights
        closed over become HLO constants — see losses/clip_loss.py)."""
        if x.shape[1] != 256:
            x = adaptive_avg_pool(x, 256)
        x = x[:, 35:223, 32:220, :]
        x = adaptive_avg_pool(x, 112)
        return self.facenet.apply(variables, x)

    def extract_feats(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply_extract_feats(self.variables, x)

    def apply(self, variables, y_hat: jnp.ndarray, y: jnp.ndarray):
        """Returns (loss, sim_improvement=0) like the reference."""
        y_feats = jax.lax.stop_gradient(self.apply_extract_feats(variables, y))
        y_hat_feats = self.apply_extract_feats(variables, y_hat)
        loss = jnp.mean(1.0 - jnp.sum(y_hat_feats * y_feats, axis=-1))
        return loss, 0.0

    def __call__(self, y_hat: jnp.ndarray, y: jnp.ndarray):
        return self.apply(self.variables, y_hat, y)
