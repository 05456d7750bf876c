"""Layer-level parity vs the torch reference (random weights, converted)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu import nn as wnn
from where2edit_tpu.convert.stylegan2 import _conv_w, _lin_w, _mod_conv_w, _np

from oracle import ref_stylegan2, t2j

RNG = np.random.default_rng(1)
KEY = jax.random.PRNGKey(0)


def rand_t(*shape):
    return torch.from_numpy(RNG.standard_normal(shape).astype(np.float32))


def close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_equal_linear():
    ref = ref_stylegan2()
    for lr_mul, act, bias_init in [(1.0, None, 0.0), (0.01, "fused_lrelu", 0.0),
                                   (1.0, None, 1.0)]:
        tmod = ref.EqualLinear(16, 32, bias_init=bias_init, lr_mul=lr_mul,
                               activation=act)
        x = rand_t(4, 16)
        out_ref = tmod(x).detach().numpy()
        jmod = wnn.EqualLinear(16, 32, bias_init=bias_init, lr_mul=lr_mul,
                               activation=act)
        params = {"weight": _lin_w(tmod.weight), "bias": _np(tmod.bias)}
        out = jmod.apply({"params": params}, jnp.asarray(x.numpy()))
        close(out, out_ref)


def test_equal_conv2d():
    ref = ref_stylegan2()
    tmod = ref.EqualConv2d(8, 16, 3, stride=2, padding=1)
    x = rand_t(2, 8, 10, 10)
    out_ref = t2j(tmod(x), nhwc=True)
    jmod = wnn.EqualConv2d(8, 16, 3, stride=2, padding=1)
    params = {"weight": _conv_w(tmod.weight), "bias": _np(tmod.bias)}
    out = jmod.apply({"params": params}, jnp.asarray(t2j(x, nhwc=True)))
    close(out, out_ref)


def test_blur_up_down():
    ref = ref_stylegan2()
    x = rand_t(2, 4, 16, 16)
    xj = jnp.asarray(t2j(x, nhwc=True))
    for tmod, jmod in [
        (ref.Upsample([1, 3, 3, 1]), wnn.Upsample((1, 3, 3, 1))),
        (ref.Downsample([1, 3, 3, 1]), wnn.Downsample((1, 3, 3, 1))),
        (ref.Blur([1, 3, 3, 1], pad=(2, 1)), wnn.Blur((1, 3, 3, 1), pad=(2, 1))),
    ]:
        out_ref = t2j(tmod(x), nhwc=True)
        out = jmod.apply({}, xj)
        close(out, out_ref)


@pytest.mark.parametrize("upsample,downsample,demod", [
    (False, False, True),
    (True, False, True),
    (False, True, True),
    (False, False, False),
])
def test_modulated_conv(upsample, downsample, demod):
    ref = ref_stylegan2()
    tmod = ref.ModulatedConv2d(8, 16, 3, 32, demodulate=demod,
                               upsample=upsample, downsample=downsample)
    x = rand_t(2, 8, 16, 16)
    style = rand_t(2, 32)
    out_ref, style_ref = tmod(x, style)
    jmod = wnn.ModulatedConv2d(8, 16, 3, 32, demodulate=demod,
                               upsample=upsample, downsample=downsample)
    params = {
        "weight": _mod_conv_w(tmod.weight),
        "modulation": {"weight": _lin_w(tmod.modulation.weight),
                       "bias": _np(tmod.modulation.bias)},
    }
    out, s = jmod.apply({"params": params}, jnp.asarray(t2j(x, nhwc=True)),
                        jnp.asarray(style.numpy()))
    close(out, t2j(out_ref, nhwc=True))
    close(s, style_ref.detach().numpy().reshape(2, 8))


def test_modulated_conv_stylespace_input():
    ref = ref_stylegan2()
    tmod = ref.ModulatedConv2d(8, 16, 3, 32)
    x = rand_t(2, 8, 16, 16)
    s_direct = rand_t(2, 1, 8, 1, 1)
    out_ref, _ = tmod(x, s_direct, input_is_stylespace=True)
    jmod = wnn.ModulatedConv2d(8, 16, 3, 32)
    params = {
        "weight": _mod_conv_w(tmod.weight),
        "modulation": {"weight": _lin_w(tmod.modulation.weight),
                       "bias": _np(tmod.modulation.bias)},
    }
    out, _ = jmod.apply({"params": params}, jnp.asarray(t2j(x, nhwc=True)),
                        jnp.asarray(s_direct.numpy().reshape(2, 8)),
                        input_is_stylespace=True)
    close(out, t2j(out_ref, nhwc=True))


def test_styled_conv_and_torgb():
    ref = ref_stylegan2()
    tconv = ref.StyledConv(8, 16, 3, 32, upsample=True)
    x = rand_t(2, 8, 8, 8)
    style = rand_t(2, 32)
    noise_t = rand_t(2, 1, 16, 16)
    out_ref, _ = tconv(x, style, noise=noise_t)

    jconv = wnn.StyledConv(8, 16, 3, 32, upsample=True)
    params = {
        "conv": {
            "weight": _mod_conv_w(tconv.conv.weight),
            "modulation": {"weight": _lin_w(tconv.conv.modulation.weight),
                           "bias": _np(tconv.conv.modulation.bias)},
        },
        "noise": {"weight": _np(tconv.noise.weight)},
        "activate_bias": _np(tconv.activate.bias),
    }
    out, _ = jconv.apply({"params": params}, jnp.asarray(t2j(x, nhwc=True)),
                         jnp.asarray(style.numpy()),
                         noise=jnp.asarray(t2j(noise_t, nhwc=True)))
    close(out, t2j(out_ref, nhwc=True))

    trgb = ref.ToRGB(16, 32)
    skip = rand_t(2, 3, 8, 8)
    y = rand_t(2, 16, 16, 16)
    rgb_ref, _ = trgb(y, style, skip=skip)
    jrgb = wnn.ToRGB(16, 32)
    params = {
        "conv": {
            "weight": _mod_conv_w(trgb.conv.weight),
            "modulation": {"weight": _lin_w(trgb.conv.modulation.weight),
                           "bias": _np(trgb.conv.modulation.bias)},
        },
        "bias": _np(trgb.bias).transpose(0, 2, 3, 1),
    }
    rgb, _ = jrgb.apply({"params": params}, jnp.asarray(t2j(y, nhwc=True)),
                        jnp.asarray(style.numpy()),
                        skip=jnp.asarray(t2j(skip, nhwc=True)))
    close(rgb, t2j(rgb_ref, nhwc=True))


def test_pixel_norm():
    ref = ref_stylegan2()
    x = rand_t(4, 16)
    out_ref = ref.PixelNorm()(x).numpy()
    close(wnn.pixel_norm(jnp.asarray(x.numpy())), out_ref)


def test_modulated_conv_fused_blur_parity(monkeypatch):
    """The TPU-only fused convT+blur form is exact (forced on via env)."""
    monkeypatch.setenv("W2E_FUSE_BLUR", "1")
    ref = ref_stylegan2()
    tmod = ref.ModulatedConv2d(8, 16, 3, 32, upsample=True)
    x = rand_t(2, 8, 16, 16)
    style = rand_t(2, 32)
    out_ref, _ = tmod(x, style)
    jmod = wnn.ModulatedConv2d(8, 16, 3, 32, upsample=True)
    params = {
        "weight": _mod_conv_w(tmod.weight),
        "modulation": {"weight": _lin_w(tmod.modulation.weight),
                       "bias": _np(tmod.modulation.bias)},
    }
    out, _ = jmod.apply({"params": params}, jnp.asarray(t2j(x, nhwc=True)),
                        jnp.asarray(style.numpy()))
    close(out, t2j(out_ref, nhwc=True))
