"""Bisect the GAN d_step compile ceiling (PERF.md: batch 8 at 1024²).

Round-4 finding: splitting the fake-batch synthesis into its own program
(train/gan_trainer.py synth_fake) compiles and RUNS at batch 8, but the
remaining d_step — discriminator fwd/bwd on real+fake — still crashes the
remote compile helper. This probe AOT-compiles (never executes) a ladder
of sub-programs to locate the exact boundary:

  fwd      D forward only, batch B (one tower)
  grad     loss + grad through D on (real, fake)
  full     grad + adam update (the shipping d_step)

Usage: python tools/d_step_probe.py [--size 1024] [--batches 4,6,8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--batches", type=str, default="4,6,8")
    p.add_argument("--stages", type=str, default="fwd,grad,grad1,full")
    p.add_argument("--d_bf16", action="store_true")
    p.add_argument("--d_remat", action="store_true")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("W2E_JAX_CACHE", "/tmp/w2e_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", flush=True)

    from where2edit_tpu.models.stylegan2 import Discriminator  # noqa: E402
    from where2edit_tpu.train.gan_trainer import logistic_d_loss  # noqa: E402

    disc = Discriminator(size=args.size,
                         dtype=jnp.bfloat16 if args.d_bf16 else jnp.float32,
                         remat=args.d_remat)
    key = jax.random.PRNGKey(0)
    d_params = jax.jit(lambda: disc.init(
        {"params": key}, jnp.zeros((1, args.size, args.size, 3))))()["params"]
    opt = optax.adam(2e-3, b1=0.0, b2=0.99)
    opt_state = opt.init(d_params)

    dp_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), d_params)
    os_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, opt_state)

    def d_apply(dp, x):
        return disc.apply({"params": dp}, x)

    def fwd(dp, real):
        return jnp.sum(d_apply(dp, real))

    def grad(dp, real, fake):
        def loss_fn(q):
            return logistic_d_loss(d_apply(q, real), d_apply(q, fake))
        return jax.value_and_grad(loss_fn)(dp)

    def grad1(dp, real):
        """Single-tower grad — isolates whether the two-tower (real+fake)
        d_step doubles past the helper's limit."""
        def loss_fn(q):
            return jnp.mean(jax.nn.softplus(
                -d_apply(q, real).astype(jnp.float32)))
        return jax.value_and_grad(loss_fn)(dp)

    def full(dp, ost, real, fake):
        loss, grads = grad(dp, real, fake)
        updates, ost = opt.update(grads, ost, dp)
        return optax.apply_updates(dp, updates), ost, loss

    for b in [int(x) for x in args.batches.split(",")]:
        real = jax.ShapeDtypeStruct((b, args.size, args.size, 3), jnp.float32)
        fake = jax.ShapeDtypeStruct((b, args.size, args.size, 3), jnp.float32)
        stages = args.stages.split(",")
        for name, fn, sh in (("fwd", fwd, (dp_shapes, real)),
                             ("grad", grad, (dp_shapes, real, fake)),
                             ("grad1", grad1, (dp_shapes, real)),
                             ("full", full,
                              (dp_shapes, os_shapes, real, fake))):
            if name not in stages:
                continue
            t0 = time.time()
            try:
                compiled = jax.jit(fn).lower(*sh).compile()
                msg = f"OK {time.time() - t0:.1f}s"
                try:
                    ma = compiled.memory_analysis()
                    msg += (f" temps={ma.temp_size_in_bytes / 2**20:.0f}MiB"
                            f" args={ma.argument_size_in_bytes / 2**20:.0f}"
                            f"MiB")
                except Exception:  # noqa: BLE001
                    pass
            except Exception as exc:  # noqa: BLE001 — the probe's purpose
                msg = (f"COMPILE FAILED {time.time() - t0:.1f}s "
                       f"({type(exc).__name__}: {str(exc)[:140]})")
            print(f"b{b:<3} {name:<5} {msg}", flush=True)


if __name__ == "__main__":
    main()
