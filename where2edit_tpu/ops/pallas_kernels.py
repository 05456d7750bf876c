"""Pallas TPU kernels for the hot per-sample ops.

``modulated_conv1x1``: the per-sample style-modulated (optionally
demodulated) pointwise conv that backs every to_rgb layer and the S-space
mappers' text-modulated attention convs:

    y[b, p, o] = demod[b, o] · Σ_i x[b, p, i] · s[b, i] · w[i, o]

One kernel fuses the input modulation, the MXU contraction and the output
demodulation — XLA emits this as three ops (scale, conv, scale) with an HBM
round-trip between each at large spatial sizes. The grid walks
(batch, spatial tiles); weights live in VMEM across the whole grid.

Falls back to the jnp composition on non-TPU backends (pallas TPU lowering
only) — `modulated_conv1x1(..., force_pallas=False)` and interpret mode are
used by the CPU test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _kernel(x_ref, s_ref, w_ref, d_ref, out_ref):
    """x: (1, T, Cin) tile; s: (B, Cin) full; w: (Cin, Cout); d: (B, Cout)."""
    b = pl.program_id(0)
    x = x_ref[0]                      # (T, Cin)
    s = s_ref[b]                      # (Cin,)
    mod = x * s[None, :].astype(x.dtype)
    acc = jnp.dot(mod, w_ref[...].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    acc = acc * d_ref[b][None, :]
    out_ref[0] = acc.astype(out_ref.dtype)


def _jnp_reference(x, s, w, demod):
    out = jnp.einsum("bpi,bi,io->bpo", x.astype(jnp.float32),
                     s.astype(jnp.float32), w.astype(jnp.float32))
    return (out * demod[:, None, :]).astype(x.dtype)


@partial(jax.jit, static_argnames=("tile", "interpret", "force_pallas"))
def modulated_conv1x1(x: jnp.ndarray, style: jnp.ndarray, w: jnp.ndarray,
                      demod: jnp.ndarray | None = None, *, tile: int = 512,
                      interpret: bool = False, force_pallas: bool = False
                      ) -> jnp.ndarray:
    """Fused per-sample modulated pointwise conv.

    Args:
      x: (B, P, Cin) — flattened spatial pixels.
      style: (B, Cin) modulation scales (already includes the equalized-LR
        weight scale).
      w: (Cin, Cout).
      demod: (B, Cout) or None (→ ones).
    Returns: (B, P, Cout) in x.dtype.
    """
    b, p, cin = x.shape
    cout = w.shape[1]
    if demod is None:
        demod = jnp.ones((b, cout), jnp.float32)

    on_tpu = jax.default_backend() == "tpu" and pltpu is not None
    if not (on_tpu or interpret or force_pallas):
        return _jnp_reference(x, style, w, demod)

    if p % tile != 0:
        tile = p  # degenerate tiny case: one tile per sample

    grid = (b, p // tile)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, p, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, cin), lambda i, j: (i, j, 0)),
            pl.BlockSpec((b, cin), lambda i, j: (0, 0)),
            pl.BlockSpec((cin, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((b, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, cout), lambda i, j: (i, j, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * cin * cout,
            bytes_accessed=(x.size + b * p * cout) * x.dtype.itemsize
            + w.size * 4,
            transcendentals=0,
        ),
    )(x, style.astype(jnp.float32), w.astype(jnp.float32),
      demod.astype(jnp.float32))
    return out
