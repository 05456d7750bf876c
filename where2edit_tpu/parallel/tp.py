"""Tensor parallelism (TP) for the synthesis stack — channel-sharded params.

The reference has no model parallelism (SURVEY.md §2.3); on TPU, sharding
the generator's conv kernels over their OUTPUT channel across a mesh axis
makes GSPMD partition every modulated conv channel-wise: each device
computes a C/n slice of every octave's activations, with the partial-sum
psum / all-gathers inserted automatically. No module changes — it is purely
a placement of the parameter pytree, composable with the generator's
spatial sharding (``Generator(spatial_mesh=...)``) and a ``data`` axis on
the same mesh.

Use when per-chip HBM or batch-1 latency is the constraint. Composes with
a ``data`` axis (DP x TP); exactness (up to psum reduction order, ~1e-5
fp32) is pinned by tests/test_spatial_sharding.py.

WARNING — do NOT combine with ``Generator(spatial_mesh=...)`` on the same
mesh: XLA's SPMD partitioner hits its "involuntary full rematerialization"
fallback on the channel+spatial resharding (its own warning cites tracked
bug b/433785288, to be fixed by the Shardy partitioner) and, as measured
on jax 0.9.0's CPU backend, produces WRONG VALUES (max abs error ~5 on a
[-1,1] image). Re-probed 2026-08-18: ``jax_use_shardy_partitioner`` is
already True by default on jax 0.9.0 and the miscompile still reproduces
(Shardy delegates this resharding to the legacy SPMD partitioner), and
whether a given (size, mesh shape, spatial_min_rows_per_shard) triggers it
is fragile — e.g. 64px on a ('sp','model')=(2,4) mesh at min_rows=2 is
wrong while (4,2) at min_rows=4 is exact. Because the failure is silent,
TP x SP on one mesh stays blanket-unsupported. Pick one of SP or TP per
program until an XLA release fixes b/433785288.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_generator_params(mesh: Mesh, variables, axis: str = "model",
                           min_channels: int = 64):
    """Device-put a generator variable tree with TP sharding.

    Conv kernels ``(kh, kw, cin, cout)`` whose ``cout`` is a multiple of the
    axis size and at least ``min_channels`` are sharded over ``axis``;
    everything else (style MLP, biases, noise buffers, small to_rgb heads)
    is replicated. Small tensors sharded across chips would pay collective
    latency for no relief — the 3-channel rgb kernels stay replicated.

    The returned tree carries a ``tp_meta`` marker collection:
    ``Generator.__call__`` raises if such a tree is applied together with
    ``spatial_mesh`` on a mesh that also carries the spatial axis — that
    combination silently miscompiles (module docstring, b/433785288). The
    presence check is structural, so the guard fires inside jit traces too.
    """
    if not isinstance(variables, dict) or "params" not in variables:
        raise ValueError("shard_generator_params expects the generator's "
                         "variable dict ({'params': ..., ...})")
    n = mesh.shape[axis]

    def place(x):
        # conv kernels are (k, k, cin, cout) with square spatial taps; the
        # square check excludes look-alike 4-D params such as the (1,4,4,C)
        # ConstantInput buffer, which must stay replicated (sharding a 4x4
        # stem constant only inserts a pointless reshard at the first conv)
        is_kernel = (getattr(x, "ndim", 0) == 4
                     and x.shape[0] == x.shape[1] and x.shape[0] <= 7)
        if (is_kernel and x.shape[-1] >= min_channels
                and x.shape[-1] % n == 0):
            return jax.device_put(
                x, NamedSharding(mesh, P(None, None, None, axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    out = dict(jax.tree.map(place, variables))
    out["tp_meta"] = {"tp": jax.device_put(jnp.ones((), jnp.int32),
                                           NamedSharding(mesh, P()))}
    return out
