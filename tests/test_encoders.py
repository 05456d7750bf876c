"""Parity for the IR-SE backbone, ArcFace net, and pSp/e4e encoders."""

import argparse

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.irse import (
    convert_backbone_params,
    convert_encoder_params,
)
from where2edit_tpu.models.encoders import (
    BackboneEncoderUsingLastLayerIntoW,
    Encoder4Editing,
    GradualStyleEncoder,
)
from where2edit_tpu.models.irse import Backbone

from oracle import ref_encoders, ref_irse, t2j

RNG = np.random.default_rng(11)


def _randomize_bn_stats(module):
    """Give running stats non-trivial values so parity actually tests them."""
    g = torch.Generator().manual_seed(5)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_arcface_backbone():
    irse = ref_irse()
    torch.manual_seed(2)
    tmod = irse.Backbone(input_size=112, num_layers=50, mode="ir_se",
                         drop_ratio=0.6)
    _randomize_bn_stats(tmod)
    tmod.eval()
    x = torch.from_numpy(RNG.standard_normal((2, 3, 112, 112)).astype(np.float32))
    with torch.no_grad():
        out_ref = tmod(x).numpy()

    jmod = Backbone(input_size=112, num_layers=50, mode="ir_se", drop_ratio=0.6)
    variables = jax.tree.map(jnp.asarray,
                             convert_backbone_params(tmod.state_dict()))
    out = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def enc_opts():
    return argparse.Namespace(stylegan_size=1024)


def test_gradual_style_encoder(enc_opts):
    pe = ref_encoders()
    torch.manual_seed(3)
    tmod = pe.GradualStyleEncoder(50, "ir_se", enc_opts)
    _randomize_bn_stats(tmod)
    tmod.eval()
    x = torch.from_numpy(RNG.standard_normal((1, 3, 256, 256)).astype(np.float32))
    with torch.no_grad():
        out_ref = tmod(x).numpy()

    jmod = GradualStyleEncoder(stylegan_size=1024)
    variables = jax.tree.map(
        jnp.asarray, convert_encoder_params(tmod.state_dict(), kind="gradual"))
    out = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)))
    assert out.shape == (1, 18, 512)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-3, atol=2e-3)


def test_e4e_encoder(enc_opts):
    pe = ref_encoders()
    torch.manual_seed(4)
    tmod = pe.Encoder4Editing(50, "ir_se", enc_opts)
    _randomize_bn_stats(tmod)
    tmod.eval()
    x = torch.from_numpy(RNG.standard_normal((1, 3, 256, 256)).astype(np.float32))
    with torch.no_grad():
        out_ref = tmod(x).numpy()

    jmod = Encoder4Editing(stylegan_size=1024)
    variables = jax.tree.map(
        jnp.asarray, convert_encoder_params(tmod.state_dict(), kind="e4e"))
    out = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)))
    assert out.shape == (1, 18, 512)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-3, atol=2e-3)


def test_e4e_bf16_dtype_knob():
    """Encoder4Editing(dtype=bf16) — the serving knob PERF.md documents
    (accurate but not faster on this chip; off by default). Pin that the
    dtype≠None branch stays wired: W+ cosine vs fp32 ≥ 0.999 on random
    weights, and it is genuinely not a no-op (outputs differ)."""
    jmod32 = Encoder4Editing(stylegan_size=1024)
    jmod16 = Encoder4Editing(stylegan_size=1024, dtype=jnp.bfloat16)
    x = jnp.asarray(RNG.standard_normal((1, 3, 256, 256)).astype(np.float32))
    x = jnp.transpose(x, (0, 2, 3, 1))
    variables = jmod32.init(jax.random.PRNGKey(7), x)
    w32 = np.asarray(jmod32.apply(variables, x), np.float32).reshape(-1)
    w16 = np.asarray(jmod16.apply(variables, x), np.float32).reshape(-1)
    assert w32.shape == w16.shape == (18 * 512,)
    assert np.any(w32 != w16), "bf16 knob is a no-op"
    cos = float(np.dot(w32, w16)
                / (np.linalg.norm(w32) * np.linalg.norm(w16)))
    assert cos >= 0.999, cos


def test_single_w_encoder(enc_opts):
    pe = ref_encoders()
    torch.manual_seed(5)
    tmod = pe.BackboneEncoderUsingLastLayerIntoW(50, "ir_se", enc_opts)
    _randomize_bn_stats(tmod)
    tmod.eval()
    x = torch.from_numpy(RNG.standard_normal((1, 3, 256, 256)).astype(np.float32))
    with torch.no_grad():
        out_ref = tmod(x).numpy()

    jmod = BackboneEncoderUsingLastLayerIntoW(stylegan_size=1024)
    variables = jax.tree.map(
        jnp.asarray, convert_encoder_params(tmod.state_dict(), kind="w"))
    out = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-3, atol=2e-3)
