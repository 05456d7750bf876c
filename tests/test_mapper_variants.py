"""Smoke coverage for the ablation mapper variants.

The production pair (FullSpaceMapperFEATClusterLin / ...Style) carries full
numerics-vs-torch-oracle parity in test_mappers.py; the remaining nets of
the 13-member family (run_attention.py:45-446,598-700 — the ablations
selected at :1013-1020) get shape/finiteness/loss-contract gates here so
refactors of the shared building blocks can't silently break them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from where2edit_tpu.editing.attention_mappers import (
    FullSpaceMapper,
    FullSpaceMapperAtt,
    FullSpaceMapperAttLin,
    FullSpaceMapperAttLinStyle,
    FullSpaceMapperCon,
    FullSpaceMapperFEATLin,
    FullSpaceMapperFEATLinStyle,
    FullSpaceMapperSpatialLin,
    MapperConLinNet,
    MapperConNet,
    MapperNet,
    attention_tables,
)

B, L, D = 2, 18, 512
SIZE = 8  # fake tap spatial size — the att convs are pointwise, so any works


def _rngs():
    return {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _finite(x):
    assert np.isfinite(np.asarray(x)).all()


def _check(out, latent_rows=L):
    if isinstance(out.latents, list):
        for s in out.latents:
            _finite(s)
    else:
        assert out.latents.shape == (B, latent_rows, D)
        _finite(out.latents)
    for loss in out.losses:
        assert loss.shape == ()
        _finite(loss)
    return out


def test_building_block_mappers():
    text = jnp.ones((B, 512))
    row = jnp.ones((B, 1, 512))
    for mod, args in [
        (MapperNet(512), (row,)),
        (MapperConNet(1024), (text[:, None, :], row)),
        (MapperConLinNet(1024), (text[:, None, :], row)),
    ]:
        y, _ = mod.init_with_output(_rngs(), *args)
        assert y.shape[-1] == 512
        _finite(y)


@pytest.mark.parametrize("cls", [FullSpaceMapper, FullSpaceMapperCon])
def test_fullspace_latent_only_variants(cls):
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    latent = jax.random.normal(jax.random.PRNGKey(3), (B, L, D))
    out, _ = cls(layers=L).init_with_output(_rngs(), text, latent)
    _check(out)
    assert out.attention_map is None


@pytest.mark.parametrize("cls,train", [
    (FullSpaceMapperAtt, False), (FullSpaceMapperAtt, True),
    (FullSpaceMapperAttLin, False), (FullSpaceMapperAttLin, True),
])
def test_fullspace_gated_variants(cls, train):
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    latent = jax.random.normal(jax.random.PRNGKey(3), (B, L, D))
    out, _ = cls(layers=L).init_with_output(_rngs(), text, latent, train=train)
    _check(out)


def test_spatial_lin_variant():
    # reference net hard-codes 13 tap convs (dim table run_attention.py:305)
    # → 14 latent rows; taps shaped to the NET's stale dim table (ablation
    # code predates the cm=2 channel table — bug-compatible)
    layers = 14
    dim = [512] * 7 + [256] * 2 + [128] * 2 + [64] * 2
    layer_num = [0, 2, 3, 5, 6, 8, 9, 11, 12, 14, 15, 17, 18]
    fm = [None] * 19
    key = jax.random.PRNGKey(4)
    for c, tap in enumerate(layer_num):
        fm[tap] = jax.random.normal(key, (B, SIZE, SIZE, dim[c]))
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    latent = jax.random.normal(jax.random.PRNGKey(3), (B, layers, D))
    out, _ = FullSpaceMapperSpatialLin(layers=layers).init_with_output(
        _rngs(), text, latent, fm, SIZE)
    _check(out, latent_rows=layers)
    assert out.attention_map.shape == (B, SIZE, SIZE, 1)
    _finite(out.attention_map)
    # the projected-cosine map is bounded to [0, 1] by construction
    amap = np.asarray(out.attention_map)
    assert amap.min() >= -1e-5 and amap.max() <= 1.0 + 1e-5


def _feat_taps(tables):
    key = jax.random.PRNGKey(4)
    fm = [jax.random.normal(key, (B, SIZE, SIZE, c))
          for c in tables["tap_channels"]]
    fm.append(jax.random.normal(key, (B, SIZE, SIZE, 512)))  # const tap
    return fm


def test_feat_lin_wplus_variant():
    tables = attention_tables(1024)
    fm = _feat_taps(tables)
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    latent = jax.random.normal(jax.random.PRNGKey(3), (B, L, D))
    mod = FullSpaceMapperFEATLin(layers=L, attention_layer=11)
    out, _ = mod.init_with_output(_rngs(), text, latent, fm, SIZE)
    _check(out)
    assert out.attention_map.shape == (B, SIZE, SIZE, 1)
    # rows at/after the mapper layer carry zero delta (ref :415-420)
    deltas = np.asarray(out.latents)
    assert np.all(deltas[:, mod.mapper_layer:] == 0)
    assert np.any(deltas[:, : mod.mapper_layer] != 0)


def test_att_lin_style_variant():
    # dim table run_attention.py:602 has 20 entries → 20 style vectors
    dims = [512] * 12 + [256] * 3 + [128] * 3 + [64] * 2
    key = jax.random.PRNGKey(4)
    styles = [jax.random.normal(key, (B, d)) for d in dims]
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    for train in (False, True):
        out, _ = FullSpaceMapperAttLinStyle(layers=L).init_with_output(
            _rngs(), text, styles, train=train)
        _check(out)
        assert len(out.latents) == len(dims)
        for s, d in zip(out.latents, dims):
            assert s.shape == (B, d)


def test_feat_attention_trunk_matches_unfused():
    """The fused _FeatAttentionTrunk (per-tap C→1 composed kernels + sum)
    must equal the reference formulation computed from the SAME params:
    per-tap C→32 1x1 convs (+bias) → resize to blend size → concat →
    544→1 conv (+bias). Mixed tap resolutions exercise both the subsample
    and the upsample paths."""
    import math

    from where2edit_tpu.editing.attention_mappers import _FeatAttentionTrunk
    from where2edit_tpu.ops.interpolate import interpolate_nearest

    tables = attention_tables(1024)
    layers = 18
    trunk = _FeatAttentionTrunk(layers=layers, generator_size=1024)

    key = jax.random.PRNGKey(0)
    size = 8
    # native resolutions alternate below/above the blend size
    fm = []
    for i, c in enumerate(tables["tap_channels"]):
        res = 4 if i % 2 == 0 else 16
        fm.append(jax.random.normal(jax.random.PRNGKey(i), (B, res, res, c)))
    fm.append(jax.random.normal(key, (B, 4, 4, 512)))  # const tap

    variables = trunk.init({"params": key}, fm, size)
    fused = trunk.apply(variables, fm, size)

    p = variables["params"]
    dim = tables["wplus_dims"]
    layer_num = tables["layer_num"]
    taps = [(fm[-1], dim[0], "attention_first")]
    taps += [(fm[layer_num[c]], dim[c], f"attention_{c}")
             for c in range(layers - 1)]
    maps = []
    for feat, d, name in taps:
        w = p[name]["weight"][0, 0] * (1.0 / math.sqrt(d))
        b = p[name]["bias"]
        if feat.shape[1] > size:
            feat = interpolate_nearest(feat, size)
        y = jnp.einsum("bhwc,co->bhwo", feat, w) + b
        if y.shape[1] < size:
            y = interpolate_nearest(y, size)
        maps.append(y)
    cat = jnp.concatenate(maps, axis=-1)
    w_last = p["attention_last"]["weight"][0, 0] * (
        1.0 / math.sqrt(32 * layers))
    unfused = (jnp.einsum("bhwc,co->bhwo", cat, w_last)
               + p["attention_last"]["bias"])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=0, atol=2e-4)


def test_feat_lin_style_variant():
    tables = attention_tables(1024)
    fm = _feat_taps(tables)
    key = jax.random.PRNGKey(4)
    styles = [jax.random.normal(key, (B, d))
              for d in tables["stylespace_dims"]]
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    mod = FullSpaceMapperFEATLinStyle(layers=L, attention_layer=11)
    out, _ = mod.init_with_output(_rngs(), text, styles, fm, SIZE)
    _check(out)
    assert len(out.latents) == len(styles)
    # styles at/after the mapper layer pass through unchanged (ref :671)
    for c in range(mod.attention_layer, len(styles)):
        np.testing.assert_array_equal(np.asarray(out.latents[c]),
                                      np.asarray(styles[c]))
    assert out.attention_map.shape == (B, SIZE, SIZE, 1)
    amap = np.asarray(out.attention_map)
    assert amap.min() >= 0.0 and amap.max() <= 1.0
