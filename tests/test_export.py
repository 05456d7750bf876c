"""Native → torch export: converter-inverse roundtrips, strict torch loads,
and forward parity of exported weights (the reverse of the oracle direction
`tests/test_generator.py` pins)."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.export import (
    export_discriminator_state,
    export_generator_state,
)
from where2edit_tpu.convert.stylegan2 import (
    convert_discriminator_params,
    convert_generator_params,
)
from where2edit_tpu.models.stylegan2 import Discriminator, Generator

from oracle import ref_stylegan2, t2j

SIZE = 32
CM = 1


def _init_gen():
    gen = Generator(size=SIZE, channel_multiplier=CM)
    variables = jax.jit(lambda: gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 512))]))()
    return gen, variables


def test_generator_export_roundtrip():
    """export ∘ convert is the identity on the flax tree."""
    _, variables = _init_gen()
    sd = export_generator_state(variables, SIZE)
    back = convert_generator_params(sd, SIZE)
    want = jax.tree.map(np.asarray, jax.device_get(
        {"params": variables["params"], "noises": variables["noises"]}))
    got_leaves, got_tree = jax.tree.flatten(back)
    want_leaves, want_tree = jax.tree.flatten(want)
    assert got_tree == want_tree
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_discriminator_export_roundtrip():
    disc = Discriminator(size=SIZE, channel_multiplier=CM)
    params = disc.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    sd = export_discriminator_state({"params": params}, SIZE)
    back = convert_discriminator_params(sd, SIZE)["params"]
    got_leaves, got_tree = jax.tree.flatten(back)
    want_leaves, want_tree = jax.tree.flatten(
        jax.tree.map(np.asarray, jax.device_get(params)))
    assert got_tree == want_tree
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_generator_export_strict_torch_load_and_parity():
    """Exported state dicts load strict=True into the rosinality Generator
    (buffer keys included) and reproduce the native forward."""
    ref = ref_stylegan2()
    gen, variables = _init_gen()
    sd = export_generator_state(variables, SIZE)

    tgen = ref.Generator(SIZE, 512, 8, channel_multiplier=CM)
    assert set(sd.keys()) == set(tgen.state_dict().keys())
    tgen.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                         strict=True)
    tgen.eval()

    z = np.random.default_rng(5).standard_normal((2, 512)).astype(np.float32)
    with torch.no_grad():
        img_ref, _ = tgen([torch.from_numpy(z)], randomize_noise=False)
    out = gen.apply(variables, [jnp.asarray(z)], randomize_noise=False)
    np.testing.assert_allclose(np.asarray(out.image),
                               t2j(img_ref, nhwc=True), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_discriminator_export_strict_torch_load_and_parity():
    ref = ref_stylegan2()
    disc = Discriminator(size=SIZE, channel_multiplier=CM)
    params = disc.init({"params": jax.random.PRNGKey(2)},
                       jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    sd = export_discriminator_state({"params": params}, SIZE)

    tdisc = ref.Discriminator(SIZE, channel_multiplier=CM)
    assert set(sd.keys()) == set(tdisc.state_dict().keys())
    tdisc.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                          strict=True)
    tdisc.eval()

    x = np.random.default_rng(6).uniform(
        -1, 1, (3, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        pred_ref = tdisc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    pred = disc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(pred), pred_ref.numpy(),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_export_weights_cli(tmp_path):
    """Train 1 step → export → the .pt holds g/g_ema/d (+latent_avg) and the
    g_ema tree converts back to the trained weights."""
    from where2edit_tpu.cli.export_weights import main as export_main
    from where2edit_tpu.cli.train_stylegan import main as train_main

    results = tmp_path / "gan"
    final = train_main([
        "--synthetic", "8", "--size", str(SIZE),
        "--channel_multiplier", str(CM), "--batch", "2", "--iter", "1",
        "--d_reg_every", "0", "--g_reg_every", "0", "--sample_every", "0",
        "--save_every", "0", "--results_dir", str(results)])

    out_pt = tmp_path / "export.pt"
    export_main(["--ckpt", final, "--out", str(out_pt),
                 "--with_latent_avg", "16"])
    assert os.path.isfile(out_pt)
    ckpt = torch.load(out_pt, weights_only=True)
    assert {"g", "g_ema", "d"} <= set(ckpt.keys())
    assert ckpt["latent_avg"].shape == (512,)

    back = convert_generator_params(
        {k: v.numpy() for k, v in ckpt["g_ema"].items()}, SIZE)
    from where2edit_tpu.train.checkpoints import load_checkpoint

    tree, _ = load_checkpoint(final)
    for a, b in zip(jax.tree.leaves(back["params"]),
                    jax.tree.leaves(tree["g_ema"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
