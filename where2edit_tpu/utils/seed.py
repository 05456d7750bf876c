"""Seeding (reference utils.py:105-111). JAX randomness is key-threaded, so
this seeds the host-side RNGs and returns a root PRNG key."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
