"""Wire-or-retire microbenchmark for the (retired) pallas modulated 1x1
conv kernel — self-contained reproduction of the PERF.md measurement.

The kernel fused input modulation + MXU contraction + output demodulation:

    y[b, p, o] = demod[b, o] · Σ_i x[b, p, i] · s[b, i] · w[i, o]

the hypothesis being that XLA emits scale → matmul → scale with HBM
round-trips between them. Measured on the real chip (fetch-fenced device
loops, see ``timeit``), the hypothesis is FALSE: XLA emits one input-fused
kernel running at ~500 GB/s effective, and the pallas kernel loses on every
shape it could back (0.46–0.97x; table in PERF.md). The package kernel
(`ops/pallas_kernels.py`) was deleted; this benchmark inlines it verbatim
so the measurement stays reproducible.

Usage: python tools/pallas_bench.py [--dtype bf16|f32] [--reps 20]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/w2e_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# the retired kernel, inlined verbatim
# ---------------------------------------------------------------------------

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


@partial(jax.jit, static_argnames=("tile",))
def modulated_conv1x1(x, style, w, demod=None, *, tile: int = 512):
    b, p, cin = x.shape
    cout = w.shape[1]
    if demod is None:
        demod = jnp.ones((b, cout), jnp.float32)
    if p % tile != 0:
        tile = p
    grid = (b, p // tile)
    return pl.pallas_call(
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
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * cin * cout,
            bytes_accessed=(x.size + b * p * cout) * x.dtype.itemsize
            + w.size * 4,
            transcendentals=0,
        ),
    )(x, style.astype(jnp.float32), w.astype(jnp.float32),
      demod.astype(jnp.float32))


# ---------------------------------------------------------------------------
# measurement harness
# ---------------------------------------------------------------------------

SHAPES = [
    ("to_rgb_s2d_1024", 8, 512 * 512, 128, 12, False),
    ("to_rgb_512", 8, 512 * 512, 64, 3, False),
    ("to_rgb_256", 8, 256 * 256, 128, 3, False),
    ("mid_1x1_demod", 8, 64 * 64, 512, 512, True),
]


def timeit(fn, x, s, w, d, reps: int = 20) -> float:
    """Device-side fori_loop timing with three hard-won rules for this
    remote-tunnel backend (each measured, see PERF.md):

    * the loop runs ON DEVICE over a per-iteration style bank — a
      loop-invariant input lets XLA hoist the whole contraction (the op is
      linear in every input, so additive/multiplicative perturbations
      distribute out and hoist too);
    * every iteration's FULL output is consumed NON-linearly
      (mean∘abs) — one element lets XLA slice the contraction to a dot,
      and a linear reduction collapses through the matmul algebraically;
    * completion is forced by FETCHING the scalar result —
      jax.block_until_ready returns early on the axon tunnel (measured
      implied bandwidth >600 TB/s without the fetch)."""
    sbank = s[None] * (1.0 + 0.01 * jnp.arange(reps, dtype=jnp.float32)
                       )[:, None, None]

    @jax.jit
    def loop(x, sbank, w, d):
        def body(i, acc):
            out = fn(x, sbank[i], w, d)
            return acc + jnp.mean(jnp.abs(out.astype(jnp.float32)))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(loop(x, sbank, w, d))  # compile + warm
    ts = []
    for rep_off in (1.0, 1.01, 1.02):
        t0 = time.perf_counter()
        float(loop(x, sbank * rep_off, w, d))
        ts.append((time.perf_counter() - t0) / reps * 1e3)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"backend={jax.default_backend()} dtype={args.dtype}", flush=True)
    key = jax.random.PRNGKey(0)

    for name, b, p, cin, cout, demod in SHAPES:
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        x = jax.random.normal(k1, (b, p, cin), dtype)
        s = jax.random.normal(k2, (b, cin), jnp.float32)
        w = jax.random.normal(k3, (cin, cout), jnp.float32)
        d = (jax.random.uniform(k4, (b, cout), jnp.float32) + 0.5
             if demod else jnp.ones((b, cout), jnp.float32))

        t_xla = timeit(_jnp_reference, x, s, w, d, reps=args.reps)
        # bandwidth roofline: read x + write out, with cout<128 outputs
        # lane-padded to 128 in the HBM layout
        pad_out = max(cout, 128) if cout < 128 else cout
        bytes_t = (x.size + b * p * pad_out) * x.dtype.itemsize
        roof_ms = bytes_t / 819e9 * 1e3  # ~819 GB/s v5e-class HBM
        try:
            t_pl = timeit(
                lambda x, s, w, d: modulated_conv1x1(x, s, w, d),
                x, s, w, d if demod else None, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            t_pl = float("nan")
            print(f"  pallas failed on {name}: {type(e).__name__}: {e}",
                  flush=True)
        print(f"{name:18s} xla={t_xla:7.3f} ms  pallas={t_pl:7.3f} ms  "
              f"roofline≈{roof_ms:6.3f} ms  speedup={t_xla / t_pl:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
