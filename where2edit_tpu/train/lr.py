"""LR schedules."""

from __future__ import annotations

import math

import jax.numpy as jnp


def styleclip_lr_schedule(initial_lr: float, total_steps: int,
                          rampdown: float = 0.25, rampup: float = 0.05):
    """Cosine ramp-down with linear warmup (attention/run_attention.py:37-42)."""

    def schedule(step):
        t = step / total_steps
        ramp = jnp.minimum(1.0, (1.0 - t) / rampdown)
        ramp = 0.5 - 0.5 * jnp.cos(ramp * math.pi)
        ramp = ramp * jnp.minimum(1.0, t / rampup)
        return initial_lr * ramp

    return schedule
