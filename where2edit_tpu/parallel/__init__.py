"""Device-mesh parallelism (replaces the reference's NCCL/DDP stack).

The reference scales with 1-process-per-GPU DDP + NCCL collectives
(attention/run_attention.py:896-945, utils.py:114-131). Here scaling is a
compiler problem: build a `jax.sharding.Mesh`, annotate array shardings, and
XLA inserts ICI collectives. The explicit-collective helpers exist for
shard_map contexts and for parity tests of the gather/broadcast semantics.
"""

from where2edit_tpu.parallel.mesh import (
    initialize_multihost,
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from where2edit_tpu.parallel.collectives import (
    gather_with_grad,
    broadcast_from_first,
)
from where2edit_tpu.parallel.tp import shard_generator_params

__all__ = [
    "initialize_multihost",
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "gather_with_grad",
    "broadcast_from_first",
    "shard_generator_params",
]
