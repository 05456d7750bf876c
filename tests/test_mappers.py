"""Parity for the StyleCLIP + Where2edit mapper families vs the reference."""

import argparse

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.mappers import (
    convert_feat_cluster_lin,
    convert_feat_cluster_lin_style,
    convert_levels_mapper,
    convert_single_mapper,
)
from where2edit_tpu.editing.attention_mappers import (
    LAYER_NUM,
    FullSpaceMapperFEATClusterLin,
    FullSpaceMapperFEATClusterLinStyle,
    wplus_dim_table,
    style_dim_table,
)
from where2edit_tpu.editing.latent_mappers import (
    STYLESPACE_DIMENSIONS,
    LevelsMapper,
    SingleMapper,
)

from oracle import ref_latent_mappers, ref_run_attention, t2j

RNG = np.random.default_rng(31)


def rand_t(*shape):
    return torch.from_numpy(RNG.standard_normal(shape).astype(np.float32))


def close(a, b, tol=2e-3):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_single_mapper():
    lm = ref_latent_mappers()
    torch.manual_seed(20)
    tmod = lm.SingleMapper(argparse.Namespace())
    x = rand_t(2, 18, 512)
    ref = tmod(x).detach().numpy()
    jmod = SingleMapper()
    variables = jax.tree.map(jnp.asarray, convert_single_mapper(tmod.state_dict()))
    close(jmod.apply(variables, jnp.asarray(x.numpy())), ref)


def test_levels_mapper():
    lm = ref_latent_mappers()
    torch.manual_seed(21)
    opts = argparse.Namespace(no_coarse_mapper=False, no_medium_mapper=False,
                              no_fine_mapper=True)
    tmod = lm.LevelsMapper(opts)
    x = rand_t(2, 18, 512)
    ref = tmod(x).detach().numpy()
    jmod = LevelsMapper(no_fine_mapper=True)
    variables = jax.tree.map(
        jnp.asarray, convert_levels_mapper(tmod.state_dict(), no_fine=True))
    close(jmod.apply(variables, jnp.asarray(x.numpy())), ref)


def _fake_feature_maps(batch, channel_multiplier=2, max_size=16):
    """26 generator taps + const-input tap with correct channel counts but
    test-sized spatial dims. Returns (torch NCHW list, jax NHWC list)."""
    from where2edit_tpu.models.stylegan2 import channel_table

    ch = channel_table(channel_multiplier)
    t_list, j_list = [], []
    # taps: conv1(4²), to_rgb1(3ch), then per octave (conv, conv, rgb 3ch)
    resolutions = [4, 4] + sum(
        [[2 ** i] * 3 for i in range(3, 11)], [])
    channels = [ch[4], 3] + sum(
        [[ch[2 ** i], ch[2 ** i], 3] for i in range(3, 11)], [])
    for c, r in zip(channels, resolutions):
        r = min(r, max_size)
        a = RNG.standard_normal((batch, c, r, r)).astype(np.float32)
        t_list.append(torch.from_numpy(a))
        j_list.append(jnp.asarray(a.transpose(0, 2, 3, 1)))
    # appended const-input tap (run_attention.py:1110)
    a = RNG.standard_normal((batch, ch[4], 4, 4)).astype(np.float32)
    t_list.append(torch.from_numpy(a))
    j_list.append(jnp.asarray(a.transpose(0, 2, 3, 1)))
    return t_list, j_list


def test_feat_cluster_lin_wplus():
    ra = ref_run_attention()
    torch.manual_seed(22)
    batch, layers, att_layer = 2, 18, 13
    tmod = ra.FullSpaceMapperFEATClusterLin_Net(
        layers, in_dim=1024, latent_dim=512, attention_layer=att_layer,
        cluster_layer=att_layer, channel_multiplier=2, clusters=5,
        cluster_dim=512 + 64)
    centers = rand_t(5, 512 + 64)
    tmod.store_clusters(centers)
    tmod.train()

    text = rand_t(batch, 512)
    latent = rand_t(batch, layers, 512)
    t_feats, j_feats = _fake_feature_maps(batch)
    blend_size = t_feats[att_layer - 1].shape[-1]

    x = torch.cat([text.unsqueeze(1).repeat(1, layers, 1), latent], dim=-1)
    delta_ref, amap_ref, losses_ref = tmod(x, t_feats, blend_size)

    jmod = FullSpaceMapperFEATClusterLin(
        layers=layers, attention_layer=att_layer, cluster_layer=att_layer,
        clusters=5, cluster_dim=512 + 64)
    variables = jax.tree.map(
        jnp.asarray,
        convert_feat_cluster_lin(tmod.state_dict(), attention_layer=att_layer))
    out = jmod.apply(variables, jnp.asarray(text.numpy()),
                     jnp.asarray(latent.numpy()), j_feats, blend_size,
                     train=True)
    close(out.latents, delta_ref.detach().numpy())
    close(np.asarray(out.attention_map)[..., 0],
          amap_ref.detach().numpy()[:, 0], tol=5e-3)
    for got, ref in zip([out.loss_delta, out.loss_reg, out.loss_tv], losses_ref):
        close(got, float(ref.detach().reshape(-1)[0].item()), tol=5e-3)


def test_feat_cluster_lin_style():
    ra = ref_run_attention()
    torch.manual_seed(23)
    batch, layers, att_layer = 2, 18, 13
    tmod = ra.FullSpaceMapperFEATClusterLinStyle_Net(
        layers, in_dim=1024, latent_dim=512, attention_layer=att_layer,
        cluster_layer=att_layer, channel_multiplier=2, clusters=5,
        cluster_dim=512 + 64)
    centers = rand_t(5, 512 + 64)
    tmod.store_clusters(centers)
    tmod.eval()

    sdims = style_dim_table(2)
    text = rand_t(batch, 512)
    styles_t = [rand_t(batch, 1, sdims[c], 1, 1) for c in range(26)]
    t_feats, j_feats = _fake_feature_maps(batch)
    blend_size = t_feats[att_layer - 1].shape[-1]

    x = [torch.cat([text.unsqueeze(1), s[:, :, :, 0, 0]], dim=-1)
         for s in styles_t]
    with torch.no_grad():
        out_ref, amap_ref, losses_ref = tmod(x, t_feats, blend_size)

    jmod = FullSpaceMapperFEATClusterLinStyle(
        layers=layers, attention_layer=att_layer, cluster_layer=att_layer,
        clusters=5, cluster_dim=512 + 64)
    variables = jax.tree.map(
        jnp.asarray,
        convert_feat_cluster_lin_style(tmod.state_dict(),
                                       attention_layer=att_layer))
    styles_j = [jnp.asarray(s.numpy().reshape(batch, -1)) for s in styles_t]
    out = jmod.apply(variables, jnp.asarray(text.numpy()), styles_j, j_feats,
                     blend_size, train=True, deterministic_noise=True)

    assert len(out.latents) == 26
    for got, ref in zip(out.latents, out_ref):
        close(got, ref.detach().numpy().reshape(got.shape))
    close(np.asarray(out.attention_map)[..., 0],
          amap_ref.detach().numpy()[:, 0], tol=5e-3)
    for got, ref in zip([out.loss_delta, out.loss_reg, out.loss_tv], losses_ref):
        close(got, float(torch.as_tensor(ref).detach().reshape(-1)[0].item()),
              tol=5e-3)


def test_style_mapper_strength_alpha_demo_twin():
    """strength_alpha scales the residual exactly like utils_demo.py:89."""
    jmod = FullSpaceMapperFEATClusterLinStyle(
        layers=18, attention_layer=13, cluster_layer=13, clusters=5,
        cluster_dim=512 + 64)
    sdims = style_dim_table(2)
    batch = 1
    text = jnp.asarray(RNG.standard_normal((batch, 512)).astype(np.float32))
    styles = [jnp.asarray(RNG.standard_normal((batch, sdims[c])).astype(np.float32))
              for c in range(26)]
    _, j_feats = _fake_feature_maps(batch)
    variables = jmod.init({"params": jax.random.PRNGKey(0)}, text, styles,
                          j_feats, 16, deterministic_noise=True)
    out1 = jmod.apply(variables, text, styles, j_feats, 16,
                      strength_alpha=0.1, deterministic_noise=True)
    out2 = jmod.apply(variables, text, styles, j_feats, 16,
                      strength_alpha=0.2, deterministic_noise=True)
    d1 = np.asarray(out1.latents[0]) - np.asarray(styles[0])
    d2 = np.asarray(out2.latents[0]) - np.asarray(styles[0])
    np.testing.assert_allclose(d2, 2 * d1, rtol=1e-4, atol=1e-5)


def test_conv_then_resize_commutes():
    """1x1 conv ∘ nearest-downsample == nearest-downsample ∘ 1x1 conv."""
    import jax
    import jax.numpy as jnp

    from where2edit_tpu.editing.attention_mappers import _conv_then_resize
    from where2edit_tpu.nn.layers import EqualConv2d
    from where2edit_tpu.ops.interpolate import interpolate_nearest

    conv = EqualConv2d(8, 4, 1)
    x = jnp.asarray(RNG.standard_normal((2, 48, 48, 8)).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x)
    bound = lambda f: conv.apply(variables, f)  # noqa: E731
    ref = interpolate_nearest(bound(x), 12)          # reference order
    got = _conv_then_resize(bound, x, 12)            # swapped (subsample 1st)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
