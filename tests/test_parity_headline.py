"""Headline parity targets (BASELINE.md): SSIM >= 0.99 vs the torch
reference with converted weights, and DP-sharded serving on the mesh."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.stylegan2 import convert_generator_params
from where2edit_tpu.eval.ssim import ssim
from where2edit_tpu.models.stylegan2 import Generator

from oracle import ref_attention_model, t2j


def test_ssim_vs_reference_256():
    """Converted torch g_ema → SSIM ≥ 0.99 (in practice ~1.0) at 256px."""
    ref = ref_attention_model()
    torch.manual_seed(123)
    tgen = ref.Generator(256, 512, 8, channel_multiplier=2)
    tgen.eval()
    variables = jax.tree.map(jnp.asarray,
                             convert_generator_params(tgen.state_dict(), 256))
    jgen = Generator(size=256)

    z = torch.randn(2, 512, generator=torch.Generator().manual_seed(9))
    noise = [torch.randn(1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2),
                         generator=torch.Generator().manual_seed(i))
             for i in range(tgen.num_layers)]
    with torch.no_grad():
        img_ref, _ = tgen([z], noise=noise)
    out = jgen.apply(variables, [jnp.asarray(z.numpy())],
                     noise=[jnp.asarray(t2j(n, nhwc=True)) for n in noise])
    score = float(ssim(out.image, jnp.asarray(t2j(img_ref, nhwc=True))))
    assert score >= 0.99, score

    # Full bf16 serving policy (synthesis + rgb chain in bf16, the bench
    # fast mode): random-init weights are the adversarial case
    # (unit-variance activations at every scale); with trained statistics
    # the gap narrows — MEASURED in r5 (tools/bf16_trained_ssim.py,
    # PERF.md): bf16 reads 0.996 on a briefly-trained EMA generator vs
    # 0.980 at random init. The per-octave fp32-pinning bisect
    # (tools/bf16_sweep.py, PERF.md) showed the random-weight error is
    # DISTRIBUTED — pinning 4 of 6 octaves fp32 still only reaches 0.989 —
    # so 0.97 is the honest random-weight gate; cli/validate.py reports
    # ssim_bf16 on real checkpoints. The reference's own reduced-precision
    # mode is fp16 --amp (run_attention.py:1068), so bf16 serving is
    # parity-consistent.
    jgen16 = Generator(size=256, dtype=jnp.bfloat16,
                       rgb_dtype=jnp.bfloat16)
    out16 = jgen16.apply(variables, [jnp.asarray(z.numpy())],
                         noise=[jnp.asarray(t2j(n, nhwc=True))
                                for n in noise])
    score16 = float(ssim(out16.image.astype(jnp.float32),
                         jnp.asarray(t2j(img_ref, nhwc=True))))
    assert score16 >= 0.97, score16


def test_dp_sharded_serving():
    """The jitted edit path scales over the 8-device mesh: batch-sharded
    inputs, replicated params — XLA inserts the collectives."""
    from where2edit_tpu.demo.api import one_text_edit
    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLinStyle,
        attention_tables,
    )
    from where2edit_tpu.parallel.mesh import data_sharding, make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh()
    size, batch, att = 32, 8, 4
    gen = Generator(size=size)
    key = jax.random.PRNGKey(0)
    gvars = gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    tables = attention_tables(size)
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=tables["n_latent"], attention_layer=att, cluster_layer=att,
        clusters=4, cluster_dim=512 + 64, generator_size=size,
        latent_dim=32, in_dim=32 + 512)

    z = jax.random.normal(key, (batch, 512))
    out = gen.apply(gvars, [z], randomize_noise=False, return_features=True)
    feats = list(out.feature_map) + [jnp.broadcast_to(
        gvars["params"]["input"]["input"], (batch, 4, 4, 512))]
    text = jax.random.normal(key, (batch, 32))
    bs = feats[att - 1].shape[1]
    mvars = dict(mapper.init({"params": key}, text, out.style_vector, feats,
                             bs, deterministic_noise=True))
    mvars["clusters"] = {"initial_state":
                         jax.random.normal(key, (4, 512 + 64))}

    # shard everything batch-major over 'data'
    text_s = jax.device_put(text, data_sharding(mesh, 2))
    styles_s = [jax.device_put(s, data_sharding(mesh, 2))
                for s in out.style_vector]
    feats_s = [jax.device_put(f, data_sharding(mesh, 4)) for f in feats]

    @jax.jit
    def edit(text, styles, feats):
        img, _, amap, _ = one_text_edit(
            generator=gen, gen_vars=gvars, mapper=mapper, mapper_vars=mvars,
            text_features=text, attention_text_features=text, latent=styles,
            feature_map=feats, attention_layer=att, work_in_stylespace=True)
        return img, amap

    img, amap = jax.jit(edit)(text_s, styles_s, feats_s)
    jax.block_until_ready(img)
    assert img.shape == (batch, size, size, 3)
    # output stays batch-sharded over the mesh
    shard_devs = {s.device for s in img.addressable_shards}
    assert len(shard_devs) == 8
    # and matches the unsharded computation
    img_ref, _ = edit(text, out.style_vector, feats)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=2e-3, atol=2e-3)
