"""bf16 SSIM bisect (VERDICT r2 weak #3): which octaves' precision costs the
SSIM vs the fp32 torch oracle on random weights (the adversarial case)?

Run on CPU:  python tools/bf16_sweep.py [size]
Prints SSIM for all-bf16, per-head-octave fp32 pins, and all-fp32.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402
import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the site config pins the remote platform and outranks the env var — force
# CPU through the config API before any backend spins up (conftest recipe)
jax.config.update("jax_platforms", "cpu")

from oracle import ref_attention_model, t2j  # noqa: E402

from where2edit_tpu.convert.stylegan2 import convert_generator_params  # noqa: E402
from where2edit_tpu.eval.ssim import ssim  # noqa: E402
from where2edit_tpu.models.stylegan2 import Generator  # noqa: E402


def main(size=256):
    ref = ref_attention_model()
    torch.manual_seed(123)
    tgen = ref.Generator(size, 512, 8, channel_multiplier=2)
    tgen.eval()
    variables = jax.tree.map(
        jnp.asarray, convert_generator_params(tgen.state_dict(), size))

    z = torch.randn(2, 512, generator=torch.Generator().manual_seed(9))
    noise = [torch.randn(1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2),
                         generator=torch.Generator().manual_seed(i))
             for i in range(tgen.num_layers)]
    with torch.no_grad():
        img_ref, _ = tgen([z], noise=noise)
    ref_img = jnp.asarray(t2j(img_ref, nhwc=True))
    zj = [jnp.asarray(z.numpy())]
    nj = [jnp.asarray(t2j(n, nhwc=True)) for n in noise]

    for head in (0, 1, 2, 3, 4):
        for rgb16 in (False, True):
            gen = Generator(size=size, dtype=jnp.bfloat16,
                            fp32_head_octaves=head,
                            rgb_dtype=jnp.bfloat16 if rgb16 else jnp.float32)
            out = jax.jit(lambda v, zz, nn, g=gen: g.apply(
                v, zz, noise=nn))(variables, zj, nj)
            s = float(ssim(out.image.astype(jnp.float32), ref_img))
            print(f"fp32_head={head} rgb_bf16={int(rgb16)}: ssim={s:.5f}",
                  flush=True)

    gen = Generator(size=size)
    out = jax.jit(lambda v, zz, nn, g=gen: g.apply(
        v, zz, noise=nn))(variables, zj, nj)
    print(f"all-fp32: ssim={float(ssim(out.image, ref_img)):.5f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
