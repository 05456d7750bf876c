"""Export native checkpoints to reference-consumable torch ``.pt`` files.

The inverse of ``cli/convert_weights.py``: a generator trained or finetuned
here (``cli/train_stylegan.py``) becomes a rosinality-layout checkpoint the
reference stack loads directly (attention/run_attention.py:979-989 —
``torch.load(path)["g_ema"]`` + ``load_state_dict`` strict). Accepts

  * a GAN-trainer checkpoint directory (``ckpt_*``: g / d / g_ema trees) —
    exports ``{"g", "d", "g_ema"}`` (plus latent_avg when --with_latent_avg);
  * a plain variables checkpoint (``{"params", "noises"}``, as written by
    ``cli/convert_weights.py``) — exports ``{"g_ema"}``.

Usage::

    w2e-export-weights --ckpt results/gan/ckpt_0800000 --out stylegan2.pt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", type=str, required=True,
                   help="native checkpoint directory")
    p.add_argument("--out", type=str, required=True,
                   help="output .pt path")
    p.add_argument("--size", type=int, default=0,
                   help="generator resolution (0 = read from the "
                        "checkpoint's saved opts)")
    p.add_argument("--with_latent_avg", type=int, default=0,
                   help="also store 'latent_avg' estimated from N mapping-"
                        "net samples (0 disables)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from where2edit_tpu.convert.export import (
        export_discriminator_state,
        export_generator_state,
    )
    from where2edit_tpu.train.checkpoints import load_checkpoint

    tree, opts = load_checkpoint(args.ckpt)
    size = args.size or int((opts or {}).get("size", 0))
    if not size:
        raise SystemExit("--size required (checkpoint has no saved opts)")

    def fallback_noises(seed: int) -> dict:
        """Seeded Gaussian noise buffers for checkpoints that predate noise
        storage. The reference initializes its buffers with torch.randn
        (models/stylegan2/model.py Generator.__init__ `noises` registration),
        so an export with zeros would make reference-side
        randomize_noise=False synthesis silently noise-free; N(0,1) matches
        the distribution the reference would otherwise have."""
        import math  # noqa: PLC0415

        n_layers = (int(math.log2(size)) - 2) * 2 + 1
        nrng = np.random.default_rng(seed)
        return {f"noise_{i}": nrng.standard_normal(
            (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1)
        ).astype(np.float32) for i in range(n_layers)}

    def as_torch(sd: dict) -> dict:
        return {k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}

    out: dict = {}
    if "g_ema" in tree:  # GAN-trainer checkpoint
        noises = tree.get("g_noises", {})
        if not noises:
            print("[export] checkpoint has no stored noises; synthesizing "
                  f"seeded N(0,1) buffers (--seed {args.seed}) to match the "
                  "reference's torch.randn init")
            noises = fallback_noises(args.seed)
        for name in ("g", "g_ema"):
            out[name] = as_torch(export_generator_state(
                {"params": tree[name], "noises": noises}, size))
        if "d" in tree:
            out["d"] = as_torch(export_discriminator_state(tree["d"], size))
        g_params, g_noises = tree["g_ema"], noises
    elif "params" in tree:  # plain generator variables
        noises = tree.get("noises", {})
        if not noises:
            print("[export] checkpoint has no stored noises; synthesizing "
                  f"seeded N(0,1) buffers (--seed {args.seed})")
            noises = fallback_noises(args.seed)
        out["g_ema"] = as_torch(export_generator_state(
            {"params": tree["params"], "noises": noises}, size))
        g_params, g_noises = tree["params"], noises
    else:
        raise SystemExit(f"unrecognized checkpoint tree keys: "
                         f"{sorted(tree.keys())[:8]}")

    if args.with_latent_avg:
        import jax
        import jax.numpy as jnp

        from where2edit_tpu.models import Generator

        cm = int((opts or {}).get("channel_multiplier", 2))
        gen = Generator(size=size, channel_multiplier=cm)
        if not g_noises:  # setup() materializes the noises collection even
            # on the mapping-only path (mapping doesn't read them)
            g_noises = fallback_noises(args.seed)
        z = jax.random.normal(jax.random.PRNGKey(args.seed),
                              (args.with_latent_avg, gen.style_dim))
        w = gen.apply({"params": jax.tree.map(jnp.asarray, g_params),
                       "noises": jax.tree.map(jnp.asarray, g_noises)}, z,
                      method=gen.get_latent)
        out["latent_avg"] = torch.from_numpy(
            np.asarray(w.mean(0), np.float32))

    torch.save(out, args.out)
    n = sum(len(v) for v in out.values() if isinstance(v, dict))
    print(f"exported {sorted(out.keys())} ({n} tensors) → {args.out}")
    return args.out


if __name__ == "__main__":
    main()
