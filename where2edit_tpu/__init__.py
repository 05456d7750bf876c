"""where2edit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-guided image
editing framework with the capabilities of Big-Brother-Pikachu/Where2edit.

Design notes
------------
* All image tensors are **NHWC** (TPU-native layout). Converters and the
  torch-parity tests transpose at the boundary.
* Compute-path code is pure JAX (jit/pjit-able, no Python side effects).
  XLA fusion covers the hot ops — measured on-chip, XLA's own fusions run
  the modulated-conv family at ~500 GB/s effective and a hand pallas
  kernel lost on every candidate shape, so it was retired (measurement +
  roofline note: PERF.md; reproduction: tools/pallas_bench.py).
* Multi-chip scaling goes through `jax.sharding.Mesh` + collectives
  (`where2edit_tpu.parallel`), not a rendezvous/NCCL port.

Reference parity map (file:line cites into /root/reference) lives in each
module's docstring.
"""

__version__ = "0.1.0"

from where2edit_tpu import nn, ops  # noqa: F401
