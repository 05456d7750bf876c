"""Diagnose the capture-program HBM ceiling that caps e2e at batch 32.

PERF.md "Batch 64": plain synthesis scales to batch 128 but the staged
edit pipeline RESOURCE_EXHAUSTs at b64 on its *capture* program (feature-tap
synthesis). This tool compiles — WITHOUT executing — the EditSession
capture program (demo/api.py::_capture: tap-subsampled return_features
synthesis) across a batch ladder and dtype policies, printing XLA's
``memory_analysis()`` (argument/output/temp bytes), so the blowup is
attributed to specific buffer classes instead of guessed at.

Usage: python tools/capture_mem.py [--size 1024] [--att_layer 13]
       [--batches 16,32,64] [--exec]  # --exec also runs it once
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def human(n):
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TiB"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--att_layer", type=int, default=13)
    p.add_argument("--batches", type=str, default="16,32,64")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 generator instead of the bf16 serving policy")
    p.add_argument("--no_s2d", action="store_true")
    p.add_argument("--exec", dest="execute", action="store_true",
                   help="also execute the largest batch once")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("W2E_JAX_CACHE", "/tmp/w2e_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", flush=True)

    from where2edit_tpu.editing.attention_mappers import tap_controls  # noqa: E402
    from where2edit_tpu.models.stylegan2 import Generator  # noqa: E402

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    gen = Generator(size=args.size, dtype=dtype,
                    rgb_dtype=dtype,
                    s2d_octaves=0 if args.no_s2d else 1)
    key = jax.random.PRNGKey(0)
    gvars = jax.jit(lambda: gen.init({"params": key, "noise": key},
                                     [jnp.zeros((1, 512))]))()
    blend, keep = tap_controls(args.size, args.att_layer, args.att_layer)

    def capture(gv, w):
        return gen.apply(gv, [w], input_is_latent=True,
                         randomize_noise=False, return_features=True,
                         tap_subsample=blend, tap_indices=keep)

    gv_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), gvars)

    for b in [int(x) for x in args.batches.split(",")]:
        w = jax.ShapeDtypeStruct((b, gen.n_latent, 512), jnp.float32)
        print(f"\n== batch {b} (dtype={dtype.__name__}, "
              f"s2d={'off' if args.no_s2d else 'on'}) ==", flush=True)
        try:
            compiled = jax.jit(capture).lower(gv_shapes, w).compile()
        except Exception as exc:  # noqa: BLE001 — ladder probe
            print(f"  COMPILE FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:300]}")
            continue
        try:
            ma = compiled.memory_analysis()
            print(f"  arguments  {human(ma.argument_size_in_bytes)}\n"
                  f"  outputs    {human(ma.output_size_in_bytes)}\n"
                  f"  temps      {human(ma.temp_size_in_bytes)}\n"
                  f"  code       {human(ma.generated_code_size_in_bytes)}\n"
                  f"  TOTAL      "
                  f"{human(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes)}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — backend may not expose it
            print(f"  memory_analysis unavailable: {exc}")
        # per-output breakdown: which taps dominate the output footprint
        outs = jax.eval_shape(capture, gv_shapes, w)
        rows = []
        for i, f in enumerate(outs.feature_map):
            if f is not None:
                rows.append((f"tap[{i}] {f.shape} {f.dtype.name}",
                             f.size * f.dtype.itemsize))
        rows.append((f"image {outs.image.shape}",
                     outs.image.size * outs.image.dtype.itemsize))
        rows.sort(key=lambda r: -r[1])
        for name, sz in rows[:8]:
            print(f"    {human(sz):>10}  {name}")
        if args.execute and b == max(
                int(x) for x in args.batches.split(",")):
            import numpy as np  # noqa: PLC0415

            wv = jnp.asarray(np.random.default_rng(0).standard_normal(
                (b, gen.n_latent, 512), dtype=np.float32))
            out = jax.block_until_ready(jax.jit(capture)(gvars, wv))
            print(f"  EXEC OK: image {out.image.shape}")


if __name__ == "__main__":
    main()
