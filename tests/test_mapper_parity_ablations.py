"""Oracle parity for the 8 non-production ablation mapper nets.

The production pair (FEATClusterLin / FEATClusterLinStyle) has full-numerics
parity in test_mappers.py; these pin the remaining run_attention.py ablation
variants (:166-446, :598-700) to the torch reference via the new converters
in convert/mappers.py. The three building-block nets (Mapper_Net,
MapperCon_Net, MapperConLin_Net, :45-163) are exercised inside the
full-space variants and need no standalone tests.
"""

import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.mappers import (
    convert_attlin_style,
    convert_featlin_style,
    convert_fullspace,
    convert_fullspace_att,
    convert_fullspace_attlin,
    convert_fullspace_con,
    convert_fullspace_featlin,
    convert_fullspace_spatiallin,
)
from where2edit_tpu.editing.attention_mappers import (
    FullSpaceMapper,
    FullSpaceMapperAtt,
    FullSpaceMapperAttLin,
    FullSpaceMapperAttLinStyle,
    FullSpaceMapperCon,
    FullSpaceMapperFEATLin,
    FullSpaceMapperFEATLinStyle,
    FullSpaceMapperSpatialLin,
)

from oracle import ref_run_attention
from test_mappers import _fake_feature_maps, close, rand_t


def _wplus_inputs(batch=2, layers=18, seed_text=0):
    text = rand_t(batch, 512)
    latent = rand_t(batch, layers, 512)
    x = torch.cat([text.unsqueeze(1).repeat(1, layers, 1), latent], dim=-1)
    return text, latent, x


def _j(t):
    return jnp.asarray(t.numpy())


def test_fullspace_mapper_parity():
    ra = ref_run_attention()
    torch.manual_seed(40)
    layers = 18
    tmod = ra.FullSpaceMapper_Net(layers, in_dim=1024, latent_dim=512).eval()
    text, latent, x = _wplus_inputs(layers=layers)
    with torch.no_grad():
        delta_ref, loss_ref = tmod(x)

    jmod = FullSpaceMapper(layers=layers)
    variables = jax.tree.map(jnp.asarray, convert_fullspace(tmod.state_dict()))
    out = jmod.apply(variables, _j(text), _j(latent))
    close(out.latents, delta_ref.numpy())
    close(out.loss_delta, float(loss_ref))


def test_fullspace_con_parity():
    ra = ref_run_attention()
    torch.manual_seed(41)
    layers = 18
    tmod = ra.FullSpaceMapperCon_Net(layers, in_dim=1024, latent_dim=512).eval()
    text, latent, x = _wplus_inputs(layers=layers)
    with torch.no_grad():
        delta_ref, loss_ref = tmod(x)

    jmod = FullSpaceMapperCon(layers=layers)
    variables = jax.tree.map(jnp.asarray,
                             convert_fullspace_con(tmod.state_dict()))
    out = jmod.apply(variables, _j(text), _j(latent))
    close(out.latents, delta_ref.numpy())
    close(out.loss_delta, float(loss_ref))


def test_fullspace_att_parity():
    """Addnoise is identity in eval (utils.py:148-152) → deterministic."""
    ra = ref_run_attention()
    torch.manual_seed(42)
    layers = 18
    tmod = ra.FullSpaceMapperAtt_Net(layers, in_dim=1024, latent_dim=512).eval()
    text, latent, x = _wplus_inputs(layers=layers)
    with torch.no_grad():
        delta_ref, loss_ref = tmod(x)  # loss = 0 + loss_att (:251-254)

    jmod = FullSpaceMapperAtt(layers=layers)
    variables = jax.tree.map(jnp.asarray,
                             convert_fullspace_att(tmod.state_dict()))
    out = jmod.apply(variables, _j(text), _j(latent), train=False)
    close(out.latents, delta_ref.numpy())
    close(out.loss_delta, float(loss_ref))


def test_fullspace_attlin_parity(monkeypatch):
    """Gumbel noise pinned to zero on both sides (the reference samples even
    in eval, utils.py:189-196) → hard one-hot of argmax(logits)."""
    ra = ref_run_attention()
    ref_utils = sys.modules["utils"]
    monkeypatch.setattr(ref_utils, "sample_gumbel",
                        lambda shape, eps=1e-20: torch.zeros(shape))
    import where2edit_tpu.editing.modules as jmodules
    monkeypatch.setattr(jmodules, "sample_gumbel",
                        lambda key, shape, eps=1e-20: jnp.zeros(shape))

    torch.manual_seed(43)
    layers = 18
    tmod = ra.FullSpaceMapperAttLin_Net(layers, in_dim=1024,
                                        latent_dim=512).eval()
    text, latent, x = _wplus_inputs(layers=layers)
    with torch.no_grad():
        delta_ref, loss_ref = tmod(x)

    jmod = FullSpaceMapperAttLin(layers=layers)
    variables = jax.tree.map(jnp.asarray,
                             convert_fullspace_attlin(tmod.state_dict()))
    out = jmod.apply(variables, _j(text), _j(latent), train=False,
                     rngs={"noise": jax.random.PRNGKey(0)})
    close(out.latents, delta_ref.numpy())
    close(out.loss_delta, float(loss_ref))


def test_fullspace_spatiallin_parity():
    """The first spatial variant: channel tables assume cm=1 (:303), 13 taps
    → layers=14. mapping_attention's output is computed-but-unused (:336)."""
    ra = ref_run_attention()
    torch.manual_seed(44)
    batch, layers, size = 2, 14, 16
    tmod = ra.FullSpaceMapperSpatialLin_Net(layers, in_dim=1024,
                                            latent_dim=512).eval()
    text, latent, x = _wplus_inputs(batch=batch, layers=layers)
    t_feats, j_feats = _fake_feature_maps(batch, channel_multiplier=1)
    with torch.no_grad():
        delta_ref, amap_ref, losses_ref = tmod(x, t_feats, size)

    jmod = FullSpaceMapperSpatialLin(layers=layers)
    variables = jax.tree.map(jnp.asarray,
                             convert_fullspace_spatiallin(tmod.state_dict()))
    out = jmod.apply(variables, _j(text), _j(latent), j_feats, size)
    close(out.latents, delta_ref.numpy())
    close(np.asarray(out.attention_map)[..., 0], amap_ref.numpy()[:, 0],
          tol=5e-3)
    for got, ref in zip(out.losses, losses_ref):
        close(got, float(torch.as_tensor(ref).reshape(-1)[0]), tol=5e-3)


def test_fullspace_featlin_parity():
    ra = ref_run_attention()
    torch.manual_seed(45)
    batch, layers, att_layer = 2, 18, 13
    tmod = ra.FullSpaceMapperFEATLin_Net(
        layers, in_dim=1024, latent_dim=512, attention_layer=att_layer,
        channel_multiplier=2).eval()
    text, latent, x = _wplus_inputs(batch=batch, layers=layers)
    t_feats, j_feats = _fake_feature_maps(batch)
    size = t_feats[att_layer - 1].shape[-1]
    with torch.no_grad():
        delta_ref, amap_ref, losses_ref = tmod(x, t_feats, size)

    jmod = FullSpaceMapperFEATLin(layers=layers, attention_layer=att_layer)
    variables = jax.tree.map(
        jnp.asarray,
        convert_fullspace_featlin(tmod.state_dict(),
                                  attention_layer=att_layer))
    out = jmod.apply(variables, _j(text), _j(latent), j_feats, size)
    close(out.latents, delta_ref.numpy())
    close(np.asarray(out.attention_map)[..., 0], amap_ref.numpy()[:, 0],
          tol=5e-3)
    for got, ref in zip(out.losses, losses_ref):
        close(got, float(torch.as_tensor(ref).reshape(-1)[0]), tol=5e-3)


def test_attlin_style_parity():
    """layers=14 keeps total_layers=20 within the reference's 20-entry dim
    table (:604; at layers=18 the reference itself would IndexError)."""
    ra = ref_run_attention()
    torch.manual_seed(46)
    batch, layers = 2, 14
    total = layers + (layers - 2) // 2
    dim = [512] * 12 + [256] * 3 + [128] * 3 + [64] * 2
    tmod = ra.FullSpaceMapperAttLinStyle_Net(layers, in_dim=1024,
                                             latent_dim=512).eval()
    text = rand_t(batch, 512)
    styles_t = [rand_t(batch, 1, dim[c]) for c in range(total)]
    x = [torch.cat([text.unsqueeze(1), s], dim=-1) for s in styles_t]
    with torch.no_grad():
        out_ref, loss_ref = tmod(x)

    jmod = FullSpaceMapperAttLinStyle(layers=layers)
    variables = jax.tree.map(jnp.asarray,
                             convert_attlin_style(tmod.state_dict()))
    styles_j = [jnp.asarray(s.numpy()[:, 0, :]) for s in styles_t]
    out = jmod.apply(variables, _j(text), styles_j, train=False)
    assert len(out.latents) == total
    for got, ref in zip(out.latents, out_ref):
        close(got, ref.numpy().reshape(got.shape))
    close(out.loss_delta, float(loss_ref))


def test_featlin_style_parity():
    ra = ref_run_attention()
    torch.manual_seed(47)
    batch, layers, att_layer = 2, 18, 13
    from where2edit_tpu.editing.attention_mappers import style_dim_table
    sdims = style_dim_table(2)
    tmod = ra.FullSpaceMapperFEATLinStyle_Net(
        layers, in_dim=1024, latent_dim=512, attention_layer=att_layer,
        channel_multiplier=2).eval()
    text = rand_t(batch, 512)
    styles_t = [rand_t(batch, 1, sdims[c]) for c in range(26)]
    x = [torch.cat([text.unsqueeze(1), s], dim=-1) for s in styles_t]
    t_feats, j_feats = _fake_feature_maps(batch)
    size = t_feats[att_layer - 1].shape[-1]
    with torch.no_grad():
        out_ref, amap_ref, losses_ref = tmod(x, t_feats, size)

    jmod = FullSpaceMapperFEATLinStyle(layers=layers,
                                       attention_layer=att_layer)
    variables = jax.tree.map(
        jnp.asarray,
        convert_featlin_style(tmod.state_dict(), attention_layer=att_layer))
    styles_j = [jnp.asarray(s.numpy()[:, 0, :]) for s in styles_t]
    out = jmod.apply(variables, _j(text), styles_j, j_feats, size)
    assert len(out.latents) == 26
    for got, ref in zip(out.latents, out_ref):
        close(got, ref.numpy().reshape(got.shape))
    close(np.asarray(out.attention_map)[..., 0], amap_ref.numpy()[:, 0],
          tol=5e-3)
    for got, ref in zip(out.losses, losses_ref):
        close(got, float(torch.as_tensor(ref).reshape(-1)[0]), tol=5e-3)
