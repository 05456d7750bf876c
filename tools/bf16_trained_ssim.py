"""bf16-policy SSIM on TRAINED weights (VERDICT r4 Next #9).

tests/test_parity_headline.py:38-44 argues random-init weights are the
adversarial case for the bf16 serving policy (unit-variance activations at
every scale) and that realistic weight statistics narrow the gap. This
measures it: train the GAN trainer briefly at 256² on-chip (synthetic
data — the statistics leave random-init regardless of the target
distribution), take the EMA generator, and compare precision policies on
the SAME fixed z/noise against the fp32/HIGHEST render of those weights.

  python tools/bf16_trained_ssim.py [--iter 600] [--size 256] [--batch 16]

Writes nothing; prints the before/after table for PERF.md.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = "/tmp/w2e_bf16_trained_{size}"


def ensure_trained(size: int, iters: int, batch: int) -> str:
    import glob

    results = RESULTS.format(size=size)
    ckpts = sorted(glob.glob(os.path.join(results, "ckpt_*")))
    if ckpts:
        return ckpts[-1]
    from where2edit_tpu.cli.train_stylegan import main as train_main

    # --workers: at 1024² the host-side data path costs ~11 s/step vs the
    # 1.07 s device step (measured r5) — the async loader hides most of
    # it. Bank of 512: a 2000-image synthetic bank at 1024² is 24 GB of
    # host RNG (minutes to materialize) for no statistical benefit here.
    n_bank = str(min(2000, max(512, 2 * iters * batch // 10)))
    train_main(["--size", str(size), "--synthetic", n_bank,
                "--batch", str(batch), "--iter", str(iters),
                "--tpu_recipe", "--workers", "2", "--prefetch", "3",
                "--results_dir", results,
                "--save_every", str(iters), "--sample_every", str(10 ** 9),
                "--seed", "0"])
    ckpts = sorted(glob.glob(os.path.join(results, "ckpt_*")))
    assert ckpts, "training produced no checkpoint"
    return ckpts[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iter", type=int, default=600)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from where2edit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from where2edit_tpu.eval.ssim import ssim
    from where2edit_tpu.models.stylegan2 import Generator
    from where2edit_tpu.train.checkpoints import load_checkpoint

    path = ensure_trained(args.size, args.iter, args.batch)
    tree, _ = load_checkpoint(path)
    print(f"loaded {path} (step {tree.get('step')})")

    def render(params_key, label):
        variables = {"params": tree[params_key]}
        if "g_noises" in tree:
            variables["noises"] = tree["g_noises"]
        z = jax.random.normal(jax.random.PRNGKey(77), (4, 512))
        outs = {}
        for name, kw, prec in [
                ("fp32/HIGHEST (ref)", {}, "float32"),
                ("fp32/DEFAULT", {}, "bfloat16"),
                ("bf16 policy/DEFAULT",
                 dict(dtype=jnp.bfloat16, rgb_dtype=jnp.bfloat16),
                 "bfloat16")]:
            gen = Generator(size=args.size, s2d_octaves=1, **kw)
            with jax.default_matmul_precision(prec):
                img = jax.jit(lambda v, zz: gen.apply(  # noqa: B023
                    v, [zz], randomize_noise=False).image)(
                    jax.tree.map(jnp.asarray, variables), z)
            outs[name] = img.astype(jnp.float32)
        ref = outs["fp32/HIGHEST (ref)"]
        print(f"[{label}]")
        for name, img in outs.items():
            with jax.default_matmul_precision("float32"):
                s = float(jax.jit(ssim)(img, ref))
            print(f"  {name:22s} SSIM {s:.5f}")

    render("g_ema", f"trained EMA, {args.size}², {tree.get('step')} steps")


if __name__ == "__main__":
    main()
