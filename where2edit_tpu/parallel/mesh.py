"""Mesh + sharding helpers."""

from __future__ import annotations

import os

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         force: bool = False, **kw) -> bool:
    """Join JAX's multi-host runtime (multi-host slice / multi-slice pod).

    The reference hand-rolls a NCCL TCP rendezvous per GPU process
    (run_attention.py:913-945: mp.spawn + init_process_group('nccl',
    'tcp://...')); on TPU the runtime owns the rendezvous — call this once
    per host before the first jax operation and every host sees the GLOBAL
    device set, so the same pjit program runs SPMD across hosts
    (collectives ride ICI within a slice, DCN across slices). The mesh
    helpers below then span ``jax.devices()`` = all chips in the job.

    Returns True when the distributed runtime is (now) initialized, False
    when it no-ops. It no-ops unless multi-host context is present —
    explicit arguments, a coordinator in the environment
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS, as set by most TPU pod
    launchers), or ``force=True`` (lets ``jax.distributed.initialize``
    auto-detect on cloud TPU metadata) — so single-host dev boxes, tests,
    and CI run unchanged.
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return True  # already initialized (idempotent)
    env_coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                 or os.environ.get("COORDINATOR_ADDRESS"))
    if not (force or coordinator_address or num_processes or env_coord):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address or env_coord,
        num_processes=num_processes, process_id=process_id, **kw)
    return True


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh. Defaults to all devices on the data axis —
    the reference's only strategy is DP (SURVEY.md §2.3); the model axis is
    there for sharding 1024² activations / channels when batch-per-chip
    exceeds HBM."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-dim sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batch-major arrays with DP sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree)
