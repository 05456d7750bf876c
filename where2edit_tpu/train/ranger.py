"""Ranger optimizer (RAdam + Lookahead + gradient centralization) in optax.

Reference: mapper/training/ranger.py:29-164 (vendored Ranger used by the
StyleCLIP Coach, coach.py:44-49). Math reproduced exactly:

  * gradient centralization on rank>1 params — the reference subtracts the
    mean over every dim except the torch *output* dim (dim 0); our layouts
    are transposed (linear (in,out), conv HWIO), so the mean runs over every
    dim except the last.
  * RAdam SMA switch at N_sma_threshhold=5.
  * integrated Lookahead: every k=6 steps, slow += alpha·(fast - slow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RangerState(NamedTuple):
    step: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    slow: optax.Params


def ranger(learning_rate: optax.ScalarOrSchedule = 1e-3,
           betas: tuple[float, float] = (0.95, 0.999),
           eps: float = 1e-5,
           weight_decay: float = 0.0,
           alpha: float = 0.5,
           k: int = 6,
           n_sma_threshold: int = 5,
           use_gc: bool = True) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RangerState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            # copy (not alias) so param buffers stay donatable
            slow=jax.tree.map(lambda p: p + 0, params),
        )

    def gc(g):
        if g.ndim > 1:
            axes = tuple(range(g.ndim - 1))
            return g - jnp.mean(g, axis=axes, keepdims=True)
        return g

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("ranger requires params")
        lr = (learning_rate(state.step) if callable(learning_rate)
              else learning_rate)
        grads = jax.tree.map(gc, updates) if use_gc else updates

        step = state.step + 1
        stepf = step.astype(jnp.float32)
        exp_avg = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g,
                               state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * g * g,
                                  state.exp_avg_sq, grads)

        beta2_t = beta2 ** stepf
        n_sma_max = 2.0 / (1 - beta2) - 1.0
        n_sma = n_sma_max - 2.0 * stepf * beta2_t / (1 - beta2_t)
        rect = jnp.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
        bias1 = 1 - beta1 ** stepf
        use_var = n_sma > n_sma_threshold
        step_size = jnp.where(use_var, rect / bias1, 1.0 / bias1)

        def delta(m, v, p):
            upd = jnp.where(use_var, m / (jnp.sqrt(v) + eps), m)
            d = -step_size * lr * upd
            if weight_decay != 0:
                d = d - weight_decay * lr * p
            return d

        new_params = jax.tree.map(
            lambda p, m, v: p + delta(m, v, p), params, exp_avg, exp_avg_sq)

        # integrated lookahead
        sync = (step % k) == 0
        new_slow = jax.tree.map(
            lambda s, p: jnp.where(sync, s + alpha * (p - s), s),
            state.slow, new_params)
        final_params = jax.tree.map(
            lambda s, p: jnp.where(sync, s, p), new_slow, new_params)

        deltas = jax.tree.map(lambda f, p: f - p, final_params, params)
        return deltas, RangerState(step, exp_avg, exp_avg_sq, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)
