"""Test config: force an 8-device virtual CPU platform before JAX loads.

Mirrors SURVEY.md §4's plan: multi-chip semantics (DP sharding, all-gather
InfoNCE, rank-0 broadcast) are exercised on a virtual mesh — no hardware
needed. Set W2E_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

if not os.environ.get("W2E_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # some environments pin the platform via a site config that outranks the
    # env var — force it through the config API before any backend spins up.
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
