"""On-chip GAN training step benchmark (adversarial StyleGAN2 pretraining).

Times each of the four jitted programs separately (fetch-fenced,
utils/profiling.sync_fetch — block_until_ready is NOT a fence on this
backend, PERF.md) and reports the amortized throughput under the lazy
cadences: imgs/s = batch / (t_d + t_g + t_ema + t_r1/d_every + t_path/g_every).

Usage: python tools/gan_bench.py [--size 1024] [--batch 8] [--bf16]
       [--remat] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--d_bf16", action="store_true")
    p.add_argument("--d_remat", action="store_true")
    p.add_argument("--d_microbatch", type=int, default=0)
    p.add_argument("--g_microbatch", type=int, default=0)
    p.add_argument("--d_s2d", type=int, default=0)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--path_batch_shrink", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("W2E_JAX_CACHE", "/tmp/w2e_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", flush=True)

    from where2edit_tpu.train.gan_trainer import (  # noqa: E402, PLC0415
        GANTrainConfig,
        GANTrainer,
    )
    from where2edit_tpu.utils.profiling import sync_fetch  # noqa: E402, PLC0415

    cfg = GANTrainConfig(size=args.size, batch_size=args.batch,
                         bf16=args.bf16, remat=args.remat,
                         d_bf16=args.d_bf16, d_remat=args.d_remat,
                         d_microbatch=args.d_microbatch,
                         g_microbatch=args.g_microbatch,
                         d_s2d_octaves=args.d_s2d,
                         d_reg_every=args.d_reg_every,
                         g_reg_every=args.g_reg_every,
                         path_batch_shrink=args.path_batch_shrink, seed=0)
    t0 = time.time()
    tr = GANTrainer(cfg)
    print(f"init {time.time() - t0:.1f}s", flush=True)

    real = jax.random.uniform(jax.random.PRNGKey(9),
                              (args.batch, args.size, args.size, 3),
                              minval=-1.0, maxval=1.0)
    kd, kg, kp = jax.random.split(jax.random.PRNGKey(1), 3)

    def timed(label, fn):
        """fn() must reassign the trainer state it donates and return the
        program's loss output (fetch-fencing one output fences the whole
        execution)."""
        t0 = time.time()
        sync_fetch(fn())
        print(f"{label} compile+first {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            sync_fetch(fn())
            ts.append(time.time() - t0)
        dt = float(np.median(ts))
        print(f"{label}: {dt * 1e3:.1f} ms", flush=True)
        return dt

    # every step donates (params, opt_state) — reassign before re-calling
    def synth_once():
        return tr._synth_fake(tr.g_params, kd)

    def d_once():
        # fake in its own program (r4 split: d_step no longer carries the
        # generator graph); timed separately below, passed in here
        fake = tr._synth_fake(tr.g_params, kd)
        tr.d_params, tr.d_opt_state, loss = tr._d_step(
            tr.d_params, tr.d_opt_state, real, fake)
        return loss

    def r1_once():
        tr.d_params, tr.d_opt_state, loss = tr._d_r1_step(
            tr.d_params, tr.d_opt_state, real)
        return loss

    def g_once():
        tr.g_params, tr.g_opt_state, loss = tr._g_step(
            tr.g_params, tr.g_opt_state, tr.d_params, kg)
        return loss

    def pl_once():
        tr.g_params, tr.g_opt_state, loss, _, tr.pl_mean = tr._g_path_step(
            tr.g_params, tr.g_opt_state, tr.pl_mean, kp)
        return loss

    def ema_once():
        tr.g_ema_params = tr._ema_step(tr.g_ema_params, tr.g_params,
                                       tr.ema_beta)
        return jax.tree.leaves(tr.g_ema_params)[0]

    def try_timed(label, fn):
        """Isolate HBM fits per program: report what runs, keep going."""
        try:
            return timed(label, fn)
        except Exception as exc:  # noqa: BLE001 — OOM/compile ladder probe
            print(f"{label} FAILED ({type(exc).__name__}): "
                  f"{str(exc)[:160]}", flush=True)
            return None

    t_synth = try_timed("synth_fake", synth_once)
    t_d = try_timed("d_step(+synth)", d_once)
    t_r1 = try_timed("d_r1_step", r1_once)
    t_g = try_timed("g_step", g_once)
    t_pl = try_timed("g_path_step", pl_once)
    t_ema = try_timed("ema", ema_once)

    if None in (t_d, t_g, t_ema):
        print("core steps did not all fit — retry at a smaller --batch")
        return
    eff = t_d + t_g + t_ema
    if args.d_reg_every > 0 and t_r1 is not None:
        eff += t_r1 / args.d_reg_every
    if args.g_reg_every > 0 and t_pl is not None:
        eff += t_pl / args.g_reg_every
    synth_ms = f"{t_synth * 1e3:.1f}" if t_synth is not None else "n/a"
    print(f"amortized step: {eff * 1e3:.1f} ms -> "
          f"{args.batch / eff:.2f} imgs/s/chip "
          f"(size {args.size}, batch {args.batch}, bf16={args.bf16}, "
          f"remat={args.remat}, d_bf16={args.d_bf16}, "
          f"d_remat={args.d_remat}, synth_fake={synth_ms} ms, "
          f"r1_fits={t_r1 is not None}, path_fits={t_pl is not None})")


if __name__ == "__main__":
    main()
