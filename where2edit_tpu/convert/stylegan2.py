"""StyleGAN2 torch checkpoint converter.

Consumes the rosinality-layout ``g_ema`` state dict used by the reference
(loaded at attention/run_attention.py:979-989) and emits this framework's
flax variable tree: ``{"params": ..., "noises": ...}``.

Accepts anything dict-like mapping names → numpy-convertible tensors, so it
works with ``torch.load(...)['g_ema']`` as well as an in-memory
``module.state_dict()`` (the parity tests' oracle path).
"""

from __future__ import annotations

import math

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_w(t) -> np.ndarray:
    """(O, I, kh, kw) → (kh, kw, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def _mod_conv_w(t) -> np.ndarray:
    """(1, O, I, kh, kw) → (kh, kw, I, O)."""
    return _np(t)[0].transpose(2, 3, 1, 0)


def _lin_w(t) -> np.ndarray:
    """(O, I) → (I, O)."""
    return _np(t).transpose(1, 0)


def _nchw(t) -> np.ndarray:
    return _np(t).transpose(0, 2, 3, 1)


def _styled_conv(sd: dict, prefix: str) -> dict:
    return {
        "conv": {
            "weight": _mod_conv_w(sd[f"{prefix}.conv.weight"]),
            "modulation": {
                "weight": _lin_w(sd[f"{prefix}.conv.modulation.weight"]),
                "bias": _np(sd[f"{prefix}.conv.modulation.bias"]),
            },
        },
        "noise": {"weight": _np(sd[f"{prefix}.noise.weight"])},
        "activate_bias": _np(sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb(sd: dict, prefix: str) -> dict:
    return {
        "conv": {
            "weight": _mod_conv_w(sd[f"{prefix}.conv.weight"]),
            "modulation": {
                "weight": _lin_w(sd[f"{prefix}.conv.modulation.weight"]),
                "bias": _np(sd[f"{prefix}.conv.modulation.bias"]),
            },
        },
        "bias": _np(sd[f"{prefix}.bias"]).transpose(0, 2, 3, 1),
    }


def convert_generator_params(state_dict: dict, size: int, n_mlp: int = 8) -> dict:
    """Build the flax variable dict for ``models.stylegan2.Generator``."""
    sd = dict(state_dict)
    log_size = int(math.log2(size))
    n_octaves = log_size - 2
    num_layers = n_octaves * 2 + 1

    params: dict = {}
    for i in range(n_mlp):
        # torch Sequential: style.0 is PixelNorm, linears start at style.1
        params[f"style_{i}"] = {
            "weight": _lin_w(sd[f"style.{i + 1}.weight"]),
            "bias": _np(sd[f"style.{i + 1}.bias"]),
        }
    params["input"] = {"input": _nchw(sd["input.input"])}
    params["conv1"] = _styled_conv(sd, "conv1")
    params["to_rgb1"] = _to_rgb(sd, "to_rgb1")
    for i in range(2 * n_octaves):
        params[f"convs_{i}"] = _styled_conv(sd, f"convs.{i}")
    for i in range(n_octaves):
        params[f"to_rgbs_{i}"] = _to_rgb(sd, f"to_rgbs.{i}")

    noises = {}
    for i in range(num_layers):
        key = f"noises.noise_{i}"
        if key in sd:
            noises[f"noise_{i}"] = _nchw(sd[key])
        else:
            r = 2 ** ((i + 5) // 2)
            noises[f"noise_{i}"] = np.zeros((1, r, r, 1), np.float32)

    return {"params": params, "noises": noises}


def _conv_layer(sd: dict, prefix: str, *, activate: bool = True,
                bias: bool = True) -> dict:
    """torch ConvLayer (Sequential) → flax ConvLayer params.

    torch indexes: [Blur,] EqualConv2d, [FusedLeakyReLU]. The conv's
    sequential index is 1 when downsampling (Blur first) else 0.
    """
    idx = 1 if f"{prefix}.1.weight" in sd else 0
    out = {"conv": {"weight": _conv_w(sd[f"{prefix}.{idx}.weight"])}}
    if bias and not activate and f"{prefix}.{idx}.bias" in sd:
        out["conv"]["bias"] = _np(sd[f"{prefix}.{idx}.bias"])
    if activate and bias:
        out["activate_bias"] = _np(sd[f"{prefix}.{idx + 1}.bias"])
    return out


def convert_discriminator_params(state_dict: dict, size: int) -> dict:
    sd = dict(state_dict)
    log_size = int(math.log2(size))
    params: dict = {"conv_in": _conv_layer(sd, "convs.0")}
    for j, i in enumerate(range(log_size, 2, -1)):
        p = f"convs.{j + 1}"
        params[f"block_{j}"] = {
            "conv1": _conv_layer(sd, f"{p}.conv1"),
            "conv2": _conv_layer(sd, f"{p}.conv2"),
            "skip": _conv_layer(sd, f"{p}.skip", activate=False, bias=False),
        }
    params["final_conv"] = _conv_layer(sd, "final_conv")
    params["final_linear1"] = {
        "weight": _lin_w(sd["final_linear.0.weight"]),
        "bias": _np(sd["final_linear.0.bias"]),
    }
    params["final_linear2"] = {
        "weight": _lin_w(sd["final_linear.1.weight"]),
        "bias": _np(sd["final_linear.1.bias"]),
    }
    return {"params": params}
