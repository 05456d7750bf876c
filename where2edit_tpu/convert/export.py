"""Native → torch checkpoint exporters (the converters' inverse).

The forward converters (`convert/stylegan2.py`) are bijective layout maps,
so checkpoints trained by this framework (`cli/train_stylegan.py`) can be
exported back to the rosinality-layout state dicts the reference ecosystem
consumes (attention/run_attention.py:979-989 loads ``ckpt["g_ema"]`` with
``load_state_dict(strict=True)``). Fixed resample-filter buffers that torch
registers in the state dict (``blur.kernel`` / ``upsample.kernel`` — pure
constants derived from the [1, 3, 3, 1] binomial kernel) are synthesized so
a strict load succeeds.

Outputs are name → float32 numpy arrays; wrap with ``torch.from_numpy``
before ``torch.save`` (see ``cli/export_weights.py``).
"""

from __future__ import annotations

import math

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def _conv_w(t) -> np.ndarray:
    """(kh, kw, I, O) → (O, I, kh, kw)."""
    return _np(t).transpose(3, 2, 0, 1)


def _mod_conv_w(t) -> np.ndarray:
    """(kh, kw, I, O) → (1, O, I, kh, kw)."""
    return _np(t).transpose(3, 2, 0, 1)[None]


def _lin_w(t) -> np.ndarray:
    """(I, O) → (O, I)."""
    return _np(t).transpose(1, 0)


def _nchw(t) -> np.ndarray:
    return _np(t).transpose(0, 3, 1, 2)


def _binomial_kernel(scale: float = 1.0) -> np.ndarray:
    """rosinality make_kernel([1,3,3,1]) (model.py:29-38): normalized outer
    product, scaled by factor² inside upsampling Blur/Upsample modules."""
    k = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.outer(k, k)
    return (k / k.sum() * scale).astype(np.float32)


def _styled_conv(p: dict, prefix: str, *, upsample: bool) -> dict:
    out = {
        f"{prefix}.conv.weight": _mod_conv_w(p["conv"]["weight"]),
        f"{prefix}.conv.modulation.weight":
            _lin_w(p["conv"]["modulation"]["weight"]),
        f"{prefix}.conv.modulation.bias":
            _np(p["conv"]["modulation"]["bias"]),
        f"{prefix}.noise.weight": _np(p["noise"]["weight"]),
        f"{prefix}.activate.bias": _np(p["activate_bias"]),
    }
    if upsample:  # Blur(upsample_factor=2) registers kernel·4
        out[f"{prefix}.conv.blur.kernel"] = _binomial_kernel(4.0)
    return out


def _to_rgb(p: dict, prefix: str, *, upsample: bool) -> dict:
    out = {
        f"{prefix}.conv.weight": _mod_conv_w(p["conv"]["weight"]),
        f"{prefix}.conv.modulation.weight":
            _lin_w(p["conv"]["modulation"]["weight"]),
        f"{prefix}.conv.modulation.bias":
            _np(p["conv"]["modulation"]["bias"]),
        f"{prefix}.bias": _nchw(p["bias"]),
    }
    if upsample:
        out[f"{prefix}.upsample.kernel"] = _binomial_kernel(4.0)
    return out


def export_generator_state(variables: dict, size: int,
                           n_mlp: int = 8) -> dict:
    """Inverse of ``convert_generator_params``: flax variables
    ``{"params": ..., "noises": ...}`` → rosinality g/g_ema state dict."""
    params = variables["params"]
    noises = variables.get("noises", {})
    log_size = int(math.log2(size))
    n_octaves = log_size - 2
    num_layers = n_octaves * 2 + 1

    sd: dict = {}
    for i in range(n_mlp):  # style.0 is PixelNorm (no params)
        sd[f"style.{i + 1}.weight"] = _lin_w(params[f"style_{i}"]["weight"])
        sd[f"style.{i + 1}.bias"] = _np(params[f"style_{i}"]["bias"])
    sd["input.input"] = _nchw(params["input"]["input"])
    sd.update(_styled_conv(params["conv1"], "conv1", upsample=False))
    sd.update(_to_rgb(params["to_rgb1"], "to_rgb1", upsample=False))
    for i in range(2 * n_octaves):
        sd.update(_styled_conv(params[f"convs_{i}"], f"convs.{i}",
                               upsample=(i % 2 == 0)))
    for i in range(n_octaves):
        sd.update(_to_rgb(params[f"to_rgbs_{i}"], f"to_rgbs.{i}",
                          upsample=True))
    for i in range(num_layers):
        key = f"noise_{i}"
        if key in noises:
            sd[f"noises.{key}"] = _nchw(noises[key])
        else:
            r = 2 ** ((i + 5) // 2)
            sd[f"noises.{key}"] = np.zeros((1, 1, r, r), np.float32)
    return sd


def _conv_layer(p: dict, prefix: str, *, downsample: bool,
                activate: bool = True) -> dict:
    """Inverse of the forward ``_conv_layer``: torch Sequential indexes are
    [Blur,] EqualConv2d, [FusedLeakyReLU]."""
    idx = 1 if downsample else 0
    out = {f"{prefix}.{idx}.weight": _conv_w(p["conv"]["weight"])}
    if downsample:  # Blur at sequential index 0 (factor 1 → no scale)
        out[f"{prefix}.0.kernel"] = _binomial_kernel(1.0)
    if "bias" in p.get("conv", {}):
        out[f"{prefix}.{idx}.bias"] = _np(p["conv"]["bias"])
    if activate and "activate_bias" in p:
        out[f"{prefix}.{idx + 1}.bias"] = _np(p["activate_bias"])
    return out


def export_discriminator_state(params: dict, size: int) -> dict:
    """Inverse of ``convert_discriminator_params``."""
    if "params" in params:
        params = params["params"]
    log_size = int(math.log2(size))
    sd: dict = {}
    sd.update(_conv_layer(params["conv_in"], "convs.0", downsample=False))
    for j, _ in enumerate(range(log_size, 2, -1)):
        p = f"convs.{j + 1}"
        sd.update(_conv_layer(params[f"block_{j}"]["conv1"], f"{p}.conv1",
                              downsample=False))
        sd.update(_conv_layer(params[f"block_{j}"]["conv2"], f"{p}.conv2",
                              downsample=True))
        sd.update(_conv_layer(params[f"block_{j}"]["skip"], f"{p}.skip",
                              downsample=True, activate=False))
    sd.update(_conv_layer(params["final_conv"], "final_conv",
                          downsample=False))
    sd["final_linear.0.weight"] = _lin_w(params["final_linear1"]["weight"])
    sd["final_linear.0.bias"] = _np(params["final_linear1"]["bias"])
    sd["final_linear.1.weight"] = _lin_w(params["final_linear2"]["weight"])
    sd["final_linear.1.bias"] = _np(params["final_linear2"]["bias"])
    return sd
