"""InceptionV3: shape contract + converter wiring round-trip."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.inception import convert_inception_params
from where2edit_tpu.models.inception import BasicConv2d, InceptionV3

RNG = np.random.default_rng(61)


def test_basic_conv2d_matches_torch():
    torch.manual_seed(40)
    conv = torch.nn.Conv2d(4, 8, 3, stride=2, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3)
    bn.running_mean.copy_(torch.randn(8) * 0.1)
    bn.running_var.copy_(torch.rand(8) + 0.5)
    bn.eval()
    x = torch.from_numpy(RNG.standard_normal((2, 4, 11, 11)).astype(np.float32))
    with torch.no_grad():
        ref = torch.relu(bn(conv(x))).numpy()

    jmod = BasicConv2d(4, 8, (3, 3), stride=2)
    variables = {
        "params": {"weight": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
                   "bn": {"scale": bn.weight.detach().numpy(),
                          "bias": bn.bias.detach().numpy()}},
        "batch_stats": {"bn": {"mean": bn.running_mean.numpy(),
                               "var": bn.running_var.numpy()}},
    }
    got = jmod.apply(jax.tree.map(jnp.asarray, variables),
                     jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_inception_shapes_and_converter_roundtrip():
    model = InceptionV3()
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(key, x)

    feats, logits = model.apply(variables, x)
    assert feats.shape == (1, 2048)
    assert logits.shape == (1, 1008)

    # build a torchvision-layout dict from the flax tree, convert back, and
    # check the converted tree reproduces the same outputs (wiring test)
    from flax import traverse_util

    flat_p = traverse_util.flatten_dict(variables["params"])
    flat_s = traverse_util.flatten_dict(variables["batch_stats"])
    sd = {}
    for path, v in flat_p.items():
        v = np.asarray(v)
        if path[-1] == "weight" and v.ndim == 4:
            prefix = ".".join(path[:-1])
            sd[f"{prefix}.conv.weight"] = torch.from_numpy(
                v.transpose(3, 2, 0, 1).copy())
        elif path[-2:] == ("bn", "scale"):
            sd[".".join(path[:-2]) + ".bn.weight"] = torch.from_numpy(v.copy())
        elif path[-2:] == ("bn", "bias"):
            sd[".".join(path[:-2]) + ".bn.bias"] = torch.from_numpy(v.copy())
        elif path == ("fc_weight",):
            sd["fc.weight"] = torch.from_numpy(v.T.copy())
        elif path == ("fc_bias",):
            sd["fc.bias"] = torch.from_numpy(v.copy())
    for path, v in flat_s.items():
        v = np.asarray(v)
        prefix = ".".join(path[:-2])
        name = "running_mean" if path[-1] == "mean" else "running_var"
        sd[f"{prefix}.bn.{name}"] = torch.from_numpy(v.copy())

    converted = jax.tree.map(jnp.asarray, convert_inception_params(sd))
    xr = jnp.asarray(RNG.standard_normal((1, 299, 299, 3)).astype(np.float32))
    f1, l1 = model.apply(variables, xr)
    f2, l2 = model.apply(converted, xr)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5,
                               atol=1e-5)
