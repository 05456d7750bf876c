"""1024² precision-policy SSIM ladder vs the torch oracle (VERDICT r4 #2).

Renders one fixed (W+, noise) face through the torch attention-fork
generator (CPU, cached to /tmp) and through every candidate serving policy
of the TPU generator, and prints SSIM per policy. The fastest policy that
clears 0.99 becomes bench.py's headline config; the rest are labeled fast
modes (PERF.md "fp32 staged ladder").

Run on the real chip:  python tools/ssim_ladder_1024.py [--size 1024]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/w2e_ssim_ladder_ref_{size}.npz"


def torch_ref(size: int):
    """Fixed-input torch render + state dict (cached: the CPU render is the
    slow half)."""
    path = CACHE.format(size=size)
    if os.path.isfile(path):
        d = np.load(path, allow_pickle=True)
        n = int(d["n_noise"])
        return (d["img"], d["state"].item(), d["w"],
                [d[f"noise_{i}"] for i in range(n)])
    import torch  # noqa: PLC0415

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/attention")
    import attention_model  # noqa: PLC0415

    torch.manual_seed(2024)
    tgen = attention_model.Generator(size, 512, 8, channel_multiplier=2)
    tgen.eval()
    rng = np.random.default_rng(1024)
    w = rng.standard_normal((1, tgen.n_latent, 512)).astype(np.float32)
    torch.manual_seed(77)
    tn = [torch.randn(1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2))
          for i in range(tgen.num_layers)]
    with torch.no_grad():
        img, _ = tgen([torch.from_numpy(w)], input_is_latent=True, noise=tn)
    img = img.numpy().transpose(0, 2, 3, 1)
    state = {k: v.numpy() for k, v in tgen.state_dict().items()}
    noise = [n.numpy().transpose(0, 2, 3, 1) for n in tn]
    np.savez(path, img=img, state=np.array(state, dtype=object), w=w,
             n_noise=len(noise),
             **{f"noise_{i}": n for i, n in enumerate(noise)})
    return img, state, w, noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    img_ref, state, w, noise = torch_ref(args.size)
    import torch  # noqa: PLC0415

    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    from where2edit_tpu.convert.stylegan2 import convert_generator_params
    from where2edit_tpu.eval.ssim import ssim
    from where2edit_tpu.models.stylegan2 import Generator

    print("devices:", jax.devices())
    variables = jax.tree.map(jnp.asarray, convert_generator_params(
        {k: torch.from_numpy(v) for k, v in state.items()}, args.size))
    ref_j = jnp.asarray(img_ref)
    w_j = jnp.asarray(w)
    jn = [jnp.asarray(n) for n in noise]

    # On TPU the *matmul precision* dominates the dtype policy: DEFAULT
    # runs every fp32 conv as one bf16 MXU pass (measured SSIM 0.87 at
    # 1024² vs the torch oracle), HIGH ('bfloat16_3x') as 3 passes,
    # HIGHEST ('float32') as 6 — so "fp32" is only 0.99-compliant
    # on-chip when the precision is raised. SSIM itself is conv-based and
    # must be evaluated under HIGHEST or it adds its own bf16 noise
    # (observed SSIM > 1).
    policies = [
        ("fp32 / HIGHEST (6-pass)", {}, "float32"),
        ("fp32 / HIGH (bf16_3x)", {}, "high"),
        ("fp32 / DEFAULT (1-pass bf16)", {}, "bfloat16"),
        ("bf16 acts / HIGHEST", dict(dtype=jnp.bfloat16), "float32"),
        ("bf16 policy / DEFAULT (fast mode)",
         dict(dtype=jnp.bfloat16, rgb_dtype=jnp.bfloat16), "bfloat16"),
    ]

    for name, kw, prec in policies:
        gen = Generator(size=args.size, s2d_octaves=1, **kw)
        with jax.default_matmul_precision(prec):
            img = jax.jit(lambda v, ww: gen.apply(  # noqa: B023
                v, [ww], input_is_latent=True, noise=jn).image)(variables,
                                                                w_j)
        with jax.default_matmul_precision("float32"):
            s = float(jax.jit(ssim)(img.astype(jnp.float32), ref_j))
        print(f"{name:44s} SSIM {s:.5f} {'  >=0.99 OK' if s >= 0.99 else ''}")


if __name__ == "__main__":
    main()
