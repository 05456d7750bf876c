"""Shared trainer-builder for the multi-process multihost test.

Deterministic by construction (fixed PRNG seeds, no host entropy), so every
process of a multi-controller job — and the single-controller comparison
run — builds bit-identical models. Mirrors tests/test_training.py's
_build_trainer at size 32.
"""

import jax
import jax.numpy as jnp

SIZE = 32


class FakeCLIP:
    def __init__(self, key, dim=64):
        self.proj = jax.random.normal(key, (3, dim)) / 8

    def __call__(self, img):
        pooled = jnp.mean(img, axis=(1, 2))
        return pooled @ self.proj


def build_attention_trainer(batch, mesh=None, steps=2):
    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLinStyle,
        attention_tables,
    )
    from where2edit_tpu.models.stylegan2 import Generator
    from where2edit_tpu.train.attention_trainer import (
        AttentionTrainConfig,
        AttentionTrainer,
    )

    gen = Generator(size=SIZE)
    key0 = jax.random.PRNGKey(0)
    gvars = gen.init({"params": key0, "noise": key0}, [jnp.zeros((1, 512))])

    tables = attention_tables(SIZE)
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=tables["n_latent"], attention_layer=4, cluster_layer=4,
        clusters=4, cluster_dim=512 + 64, generator_size=SIZE,
        latent_dim=64, in_dim=64 + 512)
    key = jax.random.PRNGKey(1)
    enc = FakeCLIP(key)

    z = jax.random.normal(key, (batch, 512))
    out = gen.apply(gvars, [z], randomize_noise=False, return_features=True)
    feats = list(out.feature_map)
    const = gvars["params"]["input"]["input"]
    feats.append(jnp.broadcast_to(const, (batch, *const.shape[1:])))
    blend_size = feats[3].shape[1]
    text = jnp.zeros((batch, 64))
    mvars = mapper.init({"params": key}, text, out.style_vector, feats,
                        blend_size, deterministic_noise=True)
    centers = jax.random.normal(key, (4, 512 + 64))
    mvars = dict(mvars)
    mvars["clusters"] = {"initial_state": centers}

    cfg = AttentionTrainConfig(stylegan_size=SIZE, attention_layer=4,
                               cluster_layer=4, batch_size=batch, step=steps,
                               work_in_stylespace=True, lr=0.05)
    trainer = AttentionTrainer(
        cfg, generator=gen, gen_vars=gvars, mapper=mapper,
        mapper_params=mvars["params"],
        encode_image=lambda lv, img: enc(img),
        perceptual=lambda lv, a, b: jnp.mean((a - b) ** 2),
        mean_latent=jnp.zeros((1, 512)),
        mapper_extra_variables={"clusters": mvars["clusters"]},
        mesh=mesh)
    bank = jax.random.normal(jax.random.PRNGKey(2), (3, 64))
    return trainer, bank
