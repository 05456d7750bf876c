"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from where2edit_tpu.ops.pallas_kernels import _jnp_reference, modulated_conv1x1

RNG = np.random.default_rng(71)


@pytest.mark.parametrize("b,p,cin,cout", [(2, 512, 64, 32), (1, 128, 32, 3),
                                          (3, 1024, 128, 128)])
def test_modulated_conv1x1_interpret(b, p, cin, cout):
    x = jnp.asarray(RNG.standard_normal((b, p, cin)).astype(np.float32))
    s = jnp.asarray(RNG.standard_normal((b, cin)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((cin, cout)).astype(np.float32))
    d = jnp.asarray(RNG.random((b, cout)).astype(np.float32) + 0.5)
    ref = _jnp_reference(x, s, w, d)
    got = modulated_conv1x1(x, s, w, d, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_modulated_conv1x1_no_demod_and_odd_size():
    x = jnp.asarray(RNG.standard_normal((2, 100, 16)).astype(np.float32))
    s = jnp.asarray(RNG.standard_normal((2, 16)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((16, 8)).astype(np.float32))
    ref = _jnp_reference(x, s, w, jnp.ones((2, 8)))
    got = modulated_conv1x1(x, s, w, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_modulated_conv2d_torgb_math():
    """The kernel computes exactly the ToRGB (demodulate=False) conv."""
    from where2edit_tpu.nn.layers import ModulatedConv2d

    mod = ModulatedConv2d(16, 3, 1, 32, demodulate=False)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 16)).astype(np.float32))
    style = jnp.asarray(RNG.standard_normal((2, 32)).astype(np.float32))
    variables = mod.init(key, x, style)
    ref, s = mod.apply(variables, x, style)

    w = variables["params"]["weight"][0, 0]  # (in, out)
    scale = 1.0 / np.sqrt(16 * 1 * 1)
    got = modulated_conv1x1(x.reshape(2, 64, 16), s * scale, w, None,
                            interpret=True).reshape(2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
