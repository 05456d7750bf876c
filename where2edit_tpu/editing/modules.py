"""Shared editing-layer modules (reference: utils.py:134-263)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn


def pairwise_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean (N, M) x (K, M) → (N, K) (utils.py:244-263).

    Expanded as |a|² - 2ab + |b|² so the cross term rides the MXU instead of
    materializing the reference's (N, K, M) broadcast tensor.
    """
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=-1)
    cross = a @ b.T
    return a2 - 2.0 * cross + b2[None, :]


class Multiply(fnn.Module):
    """utils.py:134-140."""
    scale: float = 1.0

    def __call__(self, x):
        return x * self.scale


class AddNoise(fnn.Module):
    """utils.py:143-152 — gaussian jitter in train mode only."""
    sigma: float = 1.0

    @fnn.compact
    def __call__(self, x, train: bool = False):
        if not train:
            return x
        key = self.make_rng("noise")
        return x + jax.random.normal(key, x.shape, x.dtype) * self.sigma


def sample_gumbel(key, shape, eps: float = 1e-20):
    u = jax.random.uniform(key, shape)
    return -jnp.log(-jnp.log(u + eps) + eps)


class GumbelSoftmax(fnn.Module):
    """utils.py:183-196 — soft sample in train, hard one-hot in eval."""
    temperature: float = 1.0

    @fnn.compact
    def __call__(self, x, train: bool = False):
        key = self.make_rng("noise")
        y = jax.nn.softmax(
            (x + sample_gumbel(key, x.shape)) / self.temperature, axis=-1)
        if train:
            return y
        ind = jnp.argmax(y, axis=-1)
        return jax.nn.one_hot(ind, x.shape[-1], dtype=x.dtype)


class GLU(fnn.Module):
    """utils.py:226-234 — first half gated by sigmoid of second half."""

    def __call__(self, x):
        nc = x.shape[-1] // 2
        return x[..., :nc] * fnn.sigmoid(x[..., nc:])


class CANet(fnn.Module):
    """VAE-reparam text conditioning (utils.py:199-223)."""
    t_dim: int
    c_dim: int

    @fnn.compact
    def __call__(self, text_embedding, train: bool = True):
        x = fnn.Dense(self.c_dim * 4, name="fc")(text_embedding)
        x = GLU()(x)
        mu, logvar = x[..., : self.c_dim], x[..., self.c_dim:]
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("noise"), std.shape, std.dtype) \
            if train else jnp.zeros_like(std)
        return mu + eps * std, mu, logvar


def kl_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """utils.py:237-241."""
    kld = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * jnp.mean(kld)
