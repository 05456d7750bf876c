"""Measure: can a hand Pallas 3x3 conv with a FUSED bias+leaky-relu epilogue
beat XLA's custom-call conv + standalone elementwise pass?

PERF.md's synthesis roofline leaves one named headroom item: ~20% of the
step is standalone leaky-relu epilogue passes (compare_select_fusion.*),
unavoidable with XLA's convs because custom-call convs admit no epilogue
fusion. The only way to remove that read+write is a full custom conv that
applies the epilogue before the output ever leaves VMEM. This benchmark
builds that kernel for the shipping hot shape — the s2d-octave 3x3 conv,
(B, 512, 512, 128) -> (B, 512, 512, 128) bf16 — and times it against XLA's
conv followed by the separate bias+lrelu*sqrt(2) pass, fetch-fenced, on the
real chip (methodology: tools/pallas_bench.py::timeit).

Kernel shape: grid (B, H/TH); the halo'd input rows are DMA'd from HBM into
a VMEM scratch (BlockSpec cannot express overlapping windows), the 9 taps
are accumulated as (TH*W, C) @ (C, C) MXU dots in fp32, and the epilogue
(bias add, leaky-relu(0.2), *sqrt(2)) runs on the accumulator while it is
still in VMEM — the intermediate conv output never touches HBM.

Noise injection is left out of both sides (it rides the same elementwise
fusion in XLA; bias+lrelu is the representative epilogue).

Usage: python tools/conv3x3_bench.py [--reps 10] [--th 16]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/w2e_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SQRT2 = 1.4142135623730951


# ---------------------------------------------------------------------------
# pallas fused conv3x3 + bias + leaky-relu
# ---------------------------------------------------------------------------

def _kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sems, *, th, w_cols, cin):
    """x_hbm: (B, H+2, Wp, C) padded input, stays in HBM/ANY.
    w_ref: (9, C, Cout) tap-major weights. b_ref: (1, Cout) bias.
    out_ref: (1, TH, W, Cout) block. x_vmem: (2, TH+2, Wp, C) scratch —
    double-buffered: each grid step waits on its own halo'd row DMA and
    prefetches the NEXT step's rows so the fetch overlaps the 9 tap dots
    (the TPU grid executes sequentially, last dimension fastest)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    step = b * ni + i
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def dma(bb, ii, s):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2)], x_vmem.at[s], sems.at[s])

    @pl.when(step == 0)
    def _():
        dma(b, i, slot).start()

    @pl.when(step + 1 < pl.num_programs(0) * ni)
    def _():
        nstep = step + 1
        dma(nstep // ni, jax.lax.rem(nstep, ni), nslot).start()

    dma(b, i, slot).wait()

    acc = jnp.zeros((th, w_cols, w_ref.shape[2]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xt = x_vmem[slot, pl.ds(ky, th), pl.ds(kx, w_cols), :]
            acc = acc + jax.lax.dot_general(
                xt, w_ref[ky * 3 + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0][None, None, :]
    acc = jnp.where(acc >= 0.0, acc, 0.2 * acc) * SQRT2
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def conv3x3_fused(x, w, bias, *, th: int = 16):
    """x: (B, H, W, C) bf16; w: (3, 3, C, Cout); bias: (Cout,)."""
    bsz, h, wd, c = x.shape
    cout = w.shape[3]
    assert h % th == 0
    # pad H by 1 each side; pad W by 1 left + 7 right (sublane-aligned 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    wp = xp.shape[2]
    w9 = w.reshape(9, c, cout)
    return pl.pallas_call(
        functools.partial(_kernel, th=th, w_cols=wd, cin=c),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, cout), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout),
                               lambda b, i: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * c * cout * 9,
            bytes_accessed=(x.size + bsz * h * wd * cout) * x.dtype.itemsize
            + w.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w9.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32))


def conv3x3_xla(x, w, bias):
    """The shipping formulation: XLA custom-call conv, then the epilogue as
    a separate elementwise op (what XLA emits as compare_select_fusion)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(x.dtype)[None, None, None, :]
    return jnp.where(y >= 0, y, 0.2 * y) * jnp.asarray(SQRT2, x.dtype)


# ---------------------------------------------------------------------------
# modulated variant — the actual StyledConv wiring candidate
# ---------------------------------------------------------------------------

def _kernel_mod(x_hbm, w_ref, b_ref, s_ref, d_ref, out_ref, x_vmem, sems,
                *, th, w_cols, cin):
    """Same kernel with StyleGAN2 modulation folded in: per-sample input
    scale s (B, Cin) applied once to the DMA'd rows, per-sample demod
    d (B, Cout) applied to the accumulator before bias+lrelu."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    step = b * ni + i
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def dma(bb, ii, s):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2)], x_vmem.at[s], sems.at[s])

    @pl.when(step == 0)
    def _():
        dma(b, i, slot).start()

    @pl.when(step + 1 < pl.num_programs(0) * ni)
    def _():
        nstep = step + 1
        dma(nstep // ni, jax.lax.rem(nstep, ni), nslot).start()

    dma(b, i, slot).wait()
    # one modulation pass over the halo'd rows (instead of 9 per-tap ones)
    x_vmem[slot] = (x_vmem[slot]
                    * s_ref[0, 0][None, None, :].astype(x_vmem.dtype))

    acc = jnp.zeros((th, w_cols, w_ref.shape[2]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xt = x_vmem[slot, pl.ds(ky, th), pl.ds(kx, w_cols), :]
            acc = acc + jax.lax.dot_general(
                xt, w_ref[ky * 3 + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc * d_ref[0, 0][None, None, :]
    acc = acc + b_ref[0][None, None, :]
    acc = jnp.where(acc >= 0.0, acc, 0.2 * acc) * SQRT2
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def conv3x3_mod_fused(x, w, bias, style, demod, *, th: int = 16):
    """Modulated conv + demod + bias + lrelu, all fused.
    style: (B, Cin) per-sample input scales; demod: (B, Cout)."""
    bsz, h, wd, c = x.shape
    cout = w.shape[3]
    assert h % th == 0
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    wp = xp.shape[2]
    w9 = w.reshape(9, c, cout)
    return pl.pallas_call(
        functools.partial(_kernel_mod, th=th, w_cols=wd, cin=c),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, cout), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
            # (B,1,C) with a (1,1,C) block: the lowering requires the last
            # two block dims be 8/128-divisible OR equal to the array dims
            pl.BlockSpec((1, 1, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout),
                               lambda b, i: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * c * cout * 9,
            bytes_accessed=(x.size + bsz * h * wd * cout) * x.dtype.itemsize
            + w.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w9.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32),
      style.astype(jnp.float32)[:, None, :],
      demod.astype(jnp.float32)[:, None, :])


def conv3x3_mod_xla(x, w, bias, style, demod):
    """The package's ModulatedConv2d formulation (nn/layers.py): modulate
    activations, conv, demodulate outputs; epilogue as a separate op."""
    xm = x * style[:, None, None, :].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xm, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * demod[:, None, None, :].astype(x.dtype)
    y = y + bias.astype(x.dtype)[None, None, None, :]
    return jnp.where(y >= 0, y, 0.2 * y) * jnp.asarray(SQRT2, x.dtype)


# ---------------------------------------------------------------------------
# harness (fetch-fenced device loops; see tools/pallas_bench.py::timeit)
# ---------------------------------------------------------------------------

def timeit(fn, x, w, bias, reps: int = 10) -> float:
    wbank = w[None] * (1.0 + 0.01 * jnp.arange(reps, dtype=jnp.float32)
                       )[:, None, None, None, None]

    @jax.jit
    def loop(x, wbank, bias):
        def body(i, acc):
            out = fn(x, wbank[i], bias)
            return acc + jnp.mean(jnp.abs(out.astype(jnp.float32)))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(loop(x, wbank, bias))  # compile + warm
    ts = []
    for off in (1.0, 1.01, 1.02):
        t0 = time.perf_counter()
        float(loop(x, wbank * off, bias))
        ts.append((time.perf_counter() - t0) / reps * 1e3)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--th", type=int, default=16)
    ap.add_argument("--check", action="store_true",
                    help="correctness only (small shape, works on CPU "
                         "interpret via pltpu.force_tpu_interpret_mode)")
    ap.add_argument("--check_size", type=int, default=32)
    args = ap.parse_args()

    if args.check:
        # env vars cannot override the site-pinned platform; the config
        # API can, as long as no backend has spun up yet
        jax.config.update("jax_platforms", "cpu")

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    if args.check:
        sz = args.check_size
        x = jax.random.normal(k1, (2, sz, sz, 128), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
        bias = jax.random.normal(k3, (128,), jnp.float32)
        style = jax.random.uniform(k2, (2, 128), jnp.float32) + 0.5
        dem = jax.random.uniform(k3, (2, 128), jnp.float32) + 0.5
        with pltpu.force_tpu_interpret_mode():
            got = conv3x3_fused(x, w, bias, th=min(8, sz))
            got_m = conv3x3_mod_fused(x, w, bias, style, dem, th=min(8, sz))
        want = conv3x3_xla(x, w, bias)
        want_m = conv3x3_mod_xla(x, w, bias, style, dem)
        err = float(jnp.max(jnp.abs(got - want)))
        err_m = float(jnp.max(jnp.abs(got_m - want_m)))
        print(f"correctness max|Δ| = {err:.2e}  modulated = {err_m:.2e}")
        assert err < 1e-3, "kernel does not match XLA conv"
        assert err_m < 1e-3, "modulated kernel does not match"
        return

    print(f"backend={jax.default_backend()}", flush=True)
    # the shipping hot shape: s2d-octave 3x3 conv at serving batch
    for bsz in (8, 16):
        x = jax.random.normal(k1, (bsz, 512, 512, 128), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
        bias = jax.random.normal(k3, (128,), jnp.float32)

        t_xla = timeit(conv3x3_xla, x, w, bias, reps=args.reps)
        try:
            t_pl = timeit(lambda x, w, b: conv3x3_fused(x, w, b, th=args.th),
                          x, w, bias, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            t_pl = float("nan")
            print(f"  pallas failed: {type(e).__name__}: {e}", flush=True)
        flops = 2 * x.size * 128 * 9
        print(f"b{bsz}: xla(conv+separate epilogue)={t_xla:7.3f} ms "
              f"({flops / t_xla / 1e9:6.1f} TFLOP/s)  "
              f"pallas(fused)={t_pl:7.3f} ms  "
              f"speedup={t_xla / t_pl:5.2f}x", flush=True)

        # numerics spot check on the big shape too
        got = np.asarray(conv3x3_fused(x, w, bias, th=args.th)[0, :8, :8]
                         ).astype(np.float32)
        want = np.asarray(conv3x3_xla(x, w, bias)[0, :8, :8]
                          ).astype(np.float32)
        print(f"    max|Δ| (bf16 corner) = {np.max(np.abs(got - want)):.3f}",
              flush=True)

        # modulated variant — the StyledConv wiring candidate
        style = jax.random.uniform(k2, (bsz, 128), jnp.float32) + 0.5
        dem = jax.random.uniform(k3, (bsz, 128), jnp.float32) + 0.5
        t_xla_m = timeit(lambda x, w, b: conv3x3_mod_xla(x, w, b, style, dem),
                         x, w, bias, reps=args.reps)
        try:
            t_pl_m = timeit(
                lambda x, w, b: conv3x3_mod_fused(x, w, b, style, dem,
                                                  th=args.th),
                x, w, bias, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            t_pl_m = float("nan")
            print(f"  modulated pallas failed: {type(e).__name__}: {e}",
                  flush=True)
        print(f"b{bsz} modulated: xla={t_xla_m:7.3f} ms  "
              f"pallas(fused)={t_pl_m:7.3f} ms  "
              f"speedup={t_xla_m / t_pl_m:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
