"""Persistent XLA compile cache for entry points.

A cold 1024² serving/training program takes minutes to build over a
remote-compile TPU backend; with the persistent cache a process restart
re-traces in seconds. The library never touches global jax config on
import — only entry points (CLIs, demo apps, bench) opt in via this helper,
so embedding ``where2edit_tpu`` in a host application leaves its jax
configuration alone.

Env knobs: ``W2E_COMPILE_CACHE=0`` disables; ``W2E_JAX_CACHE`` overrides the
cache directory (shared with bench.py / tools).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax at a persistent on-disk compile cache. Returns the cache
    dir, or None when disabled via ``W2E_COMPILE_CACHE=0``. Idempotent;
    safe to call before or after backend initialization."""
    if os.environ.get("W2E_COMPILE_CACHE", "1") == "0":
        return None
    import jax  # noqa: PLC0415

    path = path or os.environ.get(
        "W2E_JAX_CACHE",
        os.path.join(tempfile.gettempdir(), "w2e_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    # default min_compile_time is 1s upstream too, but pin it explicitly so
    # the fast-but-numerous small programs (tokenizer pads, mask ops) of a
    # serving session are also cached.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
