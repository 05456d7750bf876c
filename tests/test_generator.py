"""End-to-end generator parity vs the torch reference (converted weights).

Covers SURVEY.md §4's "golden end-to-end" strategy: fixed latents + fixed
noise → identical images (within fp tolerance) between the torch reference
and the TPU-native generator, including the attention fork's feature taps and
masked blending.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.stylegan2 import (
    convert_discriminator_params,
    convert_generator_params,
)
from where2edit_tpu.models.stylegan2 import Discriminator, Generator

from oracle import ref_attention_model, ref_stylegan2, t2j

RNG = np.random.default_rng(7)
SIZE = 64  # 5 octaves — exercises every code path at test-friendly cost


@pytest.fixture(scope="module")
def pair():
    ref = ref_attention_model()  # the fork: superset forward
    torch.manual_seed(0)
    tgen = ref.Generator(SIZE, 512, 8, channel_multiplier=2)
    tgen.eval()
    variables = convert_generator_params(tgen.state_dict(), SIZE)
    jgen = Generator(size=SIZE)
    return tgen, jgen, jax.tree.map(jnp.asarray, variables)


def fixed_noise(tgen):
    torch.manual_seed(3)
    tn = [torch.randn(1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2))
          for i in range(tgen.num_layers)]
    jn = [jnp.asarray(t2j(n, nhwc=True)) for n in tn]
    return tn, jn


def test_z_forward(pair):
    tgen, jgen, variables = pair
    z = torch.from_numpy(RNG.standard_normal((2, 512)).astype(np.float32))
    tn, jn = fixed_noise(tgen)
    with torch.no_grad():
        img_ref, _ = tgen([z], noise=tn)
    out = jgen.apply(variables, [jnp.asarray(z.numpy())], noise=jn)
    np.testing.assert_allclose(np.asarray(out.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)


def test_truncation_and_latents(pair):
    tgen, jgen, variables = pair
    z = torch.from_numpy(RNG.standard_normal((2, 512)).astype(np.float32))
    tn, jn = fixed_noise(tgen)
    with torch.no_grad():
        trunc_t = tgen.mean_latent(256)
        img_ref, latent_ref, styles_ref = tgen(
            [z], return_latents=True, truncation=0.7, truncation_latent=trunc_t,
            noise=tn)
    trunc_j = jnp.asarray(trunc_t.numpy())
    out = jgen.apply(variables, [jnp.asarray(z.numpy())], return_latents=True,
                     truncation=0.7, truncation_latent=trunc_j, noise=jn)
    np.testing.assert_allclose(np.asarray(out.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.latent), latent_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert len(out.style_vector) == len(styles_ref)
    for sj, st in zip(out.style_vector, styles_ref):
        np.testing.assert_allclose(
            np.asarray(sj), st.detach().numpy().reshape(sj.shape),
            rtol=1e-4, atol=1e-4)


def test_wplus_and_features(pair):
    tgen, jgen, variables = pair
    w = torch.from_numpy(RNG.standard_normal((2, tgen.n_latent, 512)).astype(np.float32))
    tn, jn = fixed_noise(tgen)
    with torch.no_grad():
        img_ref, _, _, feats_ref = tgen([w], input_is_latent=True,
                                        return_features=True, noise=tn)
    out = jgen.apply(variables, [jnp.asarray(w.numpy())], input_is_latent=True,
                     return_features=True, noise=jn)
    np.testing.assert_allclose(np.asarray(out.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)
    assert len(out.feature_map) == len(feats_ref)
    for fj, ft in zip(out.feature_map, feats_ref):
        np.testing.assert_allclose(np.asarray(fj), t2j(ft, nhwc=True),
                                   rtol=2e-3, atol=2e-3)


def test_stylespace_forward(pair):
    tgen, jgen, variables = pair
    w = torch.from_numpy(RNG.standard_normal((2, tgen.n_latent, 512)).astype(np.float32))
    tn, jn = fixed_noise(tgen)
    with torch.no_grad():
        _, _, styles_ref = tgen([w], input_is_latent=True, return_latents=True,
                                noise=tn)
        # re-synthesize from captured S-space vectors (B,1,C,1,1 in torch)
        img_ref, _ = tgen([styles_ref], input_is_stylespace=True, noise=tn)
    s_j = [jnp.asarray(s.detach().numpy().reshape(s.shape[0], -1))
           for s in styles_ref]
    out = jgen.apply(variables, s_j, input_is_stylespace=True, noise=jn)
    np.testing.assert_allclose(np.asarray(out.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("attention_layer", [1, 3, 5, 8])
def test_attention_blend(pair, attention_layer):
    """Masked blend parity incl. the to_rgb `this_layer` coupling
    (attention/attention_model.py:546-561)."""
    tgen, jgen, variables = pair
    tn, jn = fixed_noise(tgen)
    w1 = torch.from_numpy(RNG.standard_normal((2, tgen.n_latent, 512)).astype(np.float32))
    w2 = torch.from_numpy(RNG.standard_normal((2, tgen.n_latent, 512)).astype(np.float32))
    mask_np = RNG.random((2, 1, 8, 8)).astype(np.float32)
    mask_t = torch.from_numpy(mask_np)

    with torch.no_grad():
        _, _, _, feats_ref = tgen([w1], input_is_latent=True,
                                  return_features=True, noise=tn)
        img_ref, _ = tgen([w2], input_is_latent=True, noise=tn,
                          attention_layer=attention_layer,
                          attention_map=mask_t, feature_map=feats_ref)

    out1 = jgen.apply(variables, [jnp.asarray(w1.numpy())],
                      input_is_latent=True, return_features=True, noise=jn)
    out2 = jgen.apply(variables, [jnp.asarray(w2.numpy())],
                      input_is_latent=True, noise=jn,
                      attention_layer=attention_layer,
                      attention_map=jnp.asarray(mask_np.transpose(0, 2, 3, 1)),
                      feature_map=out1.feature_map)
    np.testing.assert_allclose(np.asarray(out2.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)


def test_discriminator(pair):
    ref = ref_stylegan2()
    torch.manual_seed(1)
    tdisc = ref.Discriminator(SIZE)
    tdisc.eval()
    x = torch.from_numpy(RNG.standard_normal((4, 3, SIZE, SIZE)).astype(np.float32))
    with torch.no_grad():
        out_ref = tdisc(x).numpy()
    jdisc = Discriminator(size=SIZE)
    variables = jax.tree.map(jnp.asarray,
                             convert_discriminator_params(tdisc.state_dict(), SIZE))
    out = jdisc.apply(variables, jnp.asarray(t2j(x, nhwc=True)))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=5e-3, atol=5e-3)


def test_style_mixing(pair):
    tgen, jgen, variables = pair
    tn, jn = fixed_noise(tgen)
    z1 = torch.from_numpy(RNG.standard_normal((2, 512)).astype(np.float32))
    z2 = torch.from_numpy(RNG.standard_normal((2, 512)).astype(np.float32))
    with torch.no_grad():
        img_ref, _ = tgen([z1, z2], inject_index=4, noise=tn)
    out = jgen.apply(variables, [jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy())],
                     inject_index=4, noise=jn)
    np.testing.assert_allclose(np.asarray(out.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("s2d_octaves", [0, 1])
def test_tap_subsample_and_indices(s2d_octaves):
    """Serving-capture controls: ``tap_indices`` drops taps, ``tap_subsample``
    nearest-subsamples large taps at the source — including the s2d-space
    slice for s2d octaves — exactly matching a full capture + subsample."""
    from where2edit_tpu.ops.interpolate import interpolate_nearest

    gen = Generator(size=SIZE, s2d_octaves=s2d_octaves)
    key = jax.random.PRNGKey(0)
    v = gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    w = jnp.asarray(RNG.standard_normal((2, gen.n_latent, 512)).astype(np.float32))

    full = gen.apply(v, [w], input_is_latent=True, randomize_noise=False,
                     return_features=True)
    n_taps = len(full.feature_map)
    # mix of small taps, mid convs, a to_rgb, and the final (s2d) octave
    keep = [0, 2, 5, 9, 12, n_taps - 3, n_taps - 2]
    sub = gen.apply(v, [w], input_is_latent=True, randomize_noise=False,
                    return_features=True, tap_subsample=8, tap_indices=keep)

    np.testing.assert_allclose(np.asarray(sub.image), np.asarray(full.image),
                               rtol=1e-6, atol=1e-6)
    assert len(sub.feature_map) == n_taps
    for i in range(n_taps):
        if i not in keep:
            assert sub.feature_map[i] is None, i
            continue
        want = full.feature_map[i]
        if want.shape[1] > 8:
            want = interpolate_nearest(want, 8)
        np.testing.assert_allclose(np.asarray(sub.feature_map[i]),
                                   np.asarray(want), rtol=1e-6, atol=1e-6,
                                   err_msg=f"tap {i}")
