"""Space-to-depth octave mode: exactness vs the plain pixel path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from where2edit_tpu.models.stylegan2 import Generator
from where2edit_tpu.nn.layers import depth_to_space, space_to_depth

SIZE = 64


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = Generator(size=SIZE)
    key = jax.random.PRNGKey(0)
    return gen, gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])


def _noise(gen):
    return [jax.random.normal(jax.random.PRNGKey(i),
                              (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
            for i in range(gen.num_layers)]


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 6)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("n", [1, 2, 4])
def test_s2d_octaves_exact(gen_and_vars, n):
    gen, variables = gen_and_vars
    noise = _noise(gen)
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 512))
    ref = gen.apply(variables, [z], noise=noise, return_features=True)
    gn = Generator(size=SIZE, s2d_octaves=n)
    got = gn.apply(variables, [z], noise=noise, return_features=True)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(ref.image),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(got.feature_map, ref.feature_map):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_s2d_blend_guard(gen_and_vars):
    """Blending inside the s2d region is refused."""
    gen, variables = gen_and_vars
    noise = _noise(gen)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 512))
    ref = gen.apply(variables, [z], noise=noise, return_features=True)
    gn = Generator(size=SIZE, s2d_octaves=1)
    mask = jnp.ones((1, 8, 8, 1))
    # blending at a low layer works…
    out = gn.apply(variables, [ref.latent], input_is_latent=True, noise=noise,
                   attention_layer=4, attention_map=mask,
                   feature_map=ref.feature_map)
    assert out.image.shape == (1, SIZE, SIZE, 3)
    # …but inside the s2d region it asserts
    with pytest.raises(AssertionError):
        gn.apply(variables, [ref.latent], input_is_latent=True, noise=noise,
                 attention_layer=gen.num_layers + 6, attention_map=mask,
                 feature_map=ref.feature_map)