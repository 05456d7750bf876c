"""Benchmark: end-to-end 1024² text-driven edits/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured step is the full serving path — S-space mapper (cluster
assignment, 18 text-modulated attention convs, region pooling, threshold +
blur) followed by masked 1024² synthesis — i.e. BASELINE.json config 1/4.
vs_baseline is measured against the north-star 50 edits/s on v5e-8
(= 6.25 edits/s/chip).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from where2edit_tpu.demo.api import one_text_edit  # noqa: E402
from where2edit_tpu.editing.attention_mappers import (  # noqa: E402
    FullSpaceMapperFEATClusterLinStyle,
)
from where2edit_tpu.models.stylegan2 import Generator  # noqa: E402

SIZE = 1024
BATCH = 8
ATT_LAYER = 13
BASELINE_PER_CHIP = 50.0 / 8.0


def main():
    # bf16 synthesis policy (SSIM(bf16,fp32) > 0.99; fp32 demod + RGB chain)
    # + space-to-depth final octave (exact; 2x synthesis speedup — the
    # 1024²x32ch convs run as 512²x128ch and fill the MXU tiles)
    gen = Generator(size=SIZE, dtype=jnp.bfloat16, s2d_octaves=1)
    key = jax.random.PRNGKey(0)
    init_z = [jnp.zeros((1, 512))]
    gvars = jax.jit(lambda: gen.init({"params": key, "noise": key}, init_z))()

    @jax.jit
    def synth(z):
        return gen.apply(gvars, [z], randomize_noise=False,
                         return_features=True)

    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 512))
    out = jax.block_until_ready(synth(z))
    feats = list(out.feature_map)
    const = gvars["params"]["input"]["input"]
    feats.append(jnp.broadcast_to(const, (BATCH, *const.shape[1:])))

    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=gen.n_latent, attention_layer=ATT_LAYER,
        cluster_layer=ATT_LAYER, clusters=10, generator_size=SIZE)
    text = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 512))
    blend_size = feats[ATT_LAYER - 1].shape[1]
    mapper_init = jax.jit(lambda t, s, f: mapper.init(
        {"params": key}, t, s, f, blend_size, deterministic_noise=True))
    mvars = dict(mapper_init(text, out.style_vector, feats))
    mvars["clusters"] = {"initial_state":
                         jax.random.normal(key, (10, 576))}

    @jax.jit
    def edit(text, styles, feats):
        img, _, amap, _ = one_text_edit(
            generator=gen, gen_vars=gvars, mapper=mapper, mapper_vars=mvars,
            text_features=text, attention_text_features=text,
            latent=styles, feature_map=feats, attention_layer=ATT_LAYER,
            work_in_stylespace=True)
        return img, amap

    img, _ = jax.block_until_ready(edit(text, out.style_vector, feats))
    assert img.shape == (BATCH, SIZE, SIZE, 3)

    # timed region: N sequential edits inside ONE program — measures device
    # throughput rather than the dev-tunnel's per-dispatch RTT (a co-located
    # serving host pays dispatch once per request stream, not per edit)
    N = 10

    @jax.jit
    def edit_loop(texts, styles, feats):
        def body(i, acc):
            img, _, amap, _ = one_text_edit(
                generator=gen, gen_vars=gvars, mapper=mapper,
                mapper_vars=mvars, text_features=texts[i],
                attention_text_features=texts[i], latent=styles,
                feature_map=feats, attention_layer=ATT_LAYER,
                work_in_stylespace=True)
            return acc + jnp.mean(img)
        return jax.lax.fori_loop(0, N, body, 0.0)

    texts = jax.random.normal(jax.random.PRNGKey(3), (N, BATCH, 512))
    jax.block_until_ready(edit_loop(texts, out.style_vector, feats))
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(edit_loop(texts, out.style_vector, feats))
    dt = (time.time() - t0) / (reps * N)
    edits_per_sec = BATCH / dt

    print(json.dumps({
        "metric": "1024px_text_edits_per_sec_per_chip",
        "value": round(edits_per_sec, 2),
        "unit": "edits/s/chip",
        "vs_baseline": round(edits_per_sec / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
