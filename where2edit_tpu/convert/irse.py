"""IR-SE / pSp-e4e torch checkpoint converters.

Consumes the TreB1eN-layout ArcFace state dict (criteria/id_loss.py:11) and
the pSp/e4e encoder dicts (models/psp.py:48-62, utils.py:622-636).
"""

from __future__ import annotations

import numpy as np

from where2edit_tpu.convert.stylegan2 import _conv_w, _lin_w, _np
from where2edit_tpu.models.irse import get_blocks


def _bn(sd: dict, prefix: str, affine: bool = True):
    params = {}
    if affine:
        params = {"scale": _np(sd[f"{prefix}.weight"]),
                  "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _one_block(sd: dict, idx: int, spec, mode: str):
    """body.{idx} torch block → (params, batch_stats) for BottleneckIR."""
    bp: dict = {}
    bs: dict = {}
    if spec.in_channel != spec.depth:
        bp["shortcut_conv"] = {
            "weight": _conv_w(sd[f"body.{idx}.shortcut_layer.0.weight"])}
        p, s = _bn(sd, f"body.{idx}.shortcut_layer.1")
        bp["shortcut_bn"], bs["shortcut_bn"] = p, s
    p, s = _bn(sd, f"body.{idx}.res_layer.0")
    bp["bn1"], bs["bn1"] = p, s
    bp["conv1"] = {"weight": _conv_w(sd[f"body.{idx}.res_layer.1.weight"])}
    bp["prelu"] = {"alpha": _np(sd[f"body.{idx}.res_layer.2.weight"])}
    bp["conv2"] = {"weight": _conv_w(sd[f"body.{idx}.res_layer.3.weight"])}
    p, s = _bn(sd, f"body.{idx}.res_layer.4")
    bp["bn2"], bs["bn2"] = p, s
    if mode == "ir_se":
        bp["se"] = {
            "fc1": {"weight": _conv_w(sd[f"body.{idx}.res_layer.5.fc1.weight"])},
            "fc2": {"weight": _conv_w(sd[f"body.{idx}.res_layer.5.fc2.weight"])},
        }
    return bp, bs


def _stack_tree(trees: list) -> dict:
    """Stack a list of identically-shaped nested dicts along a new axis 0
    (the nn.scan parameter layout)."""
    out: dict = {}
    for k, v in trees[0].items():
        if isinstance(v, dict):
            out[k] = _stack_tree([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees])
    return out


def _body_params(sd: dict, num_layers: int, mode: str, scanned: bool = True):
    """input_layer + body.{i} → IRSEBody tree. Returns (params, batch_stats).

    ``scanned``: stage tails are stacked along axis 0 for the nn.scan trunk
    (models/irse.py::IRSEBody); pass False for the unrolled fallback layout
    (want_taps with num_layers != 50).
    """
    params: dict = {"input_conv": {"weight": _conv_w(sd["input_layer.0.weight"])}}
    stats: dict = {}
    p, s = _bn(sd, "input_layer.1")
    params["input_bn"], stats["input_bn"] = p, s
    params["input_prelu"] = {"alpha": _np(sd["input_layer.2.weight"])}

    idx = 0
    for si, block in enumerate(get_blocks(num_layers)):
        if scanned:
            head, tail = block[0], block[1:]
            bp, bs = _one_block(sd, idx, head, mode)
            params[f"body_{idx}"], stats[f"body_{idx}"] = bp, bs
            idx += 1
            if tail:
                pairs = [_one_block(sd, idx + j, spec, mode)
                         for j, spec in enumerate(tail)]
                params[f"stage{si}_tail"] = {
                    "blk": _stack_tree([p_ for p_, _ in pairs])}
                stats[f"stage{si}_tail"] = {
                    "blk": _stack_tree([s_ for _, s_ in pairs])}
                idx += len(tail)
        else:
            for spec in block:
                bp, bs = _one_block(sd, idx, spec, mode)
                params[f"body_{idx}"], stats[f"body_{idx}"] = bp, bs
                idx += 1
    return params, stats


def convert_backbone_params(state_dict: dict, num_layers: int = 50,
                            mode: str = "ir_se", affine: bool = True) -> dict:
    """ArcFace Backbone (model_irse.py:9-47) → flax variables."""
    sd = dict(state_dict)
    body_p, body_s = _body_params(sd, num_layers, mode)
    params: dict = {"body": body_p}
    stats: dict = {"body": body_s}
    p, s = _bn(sd, "output_layer.0")
    params["output_bn"], stats["output_bn"] = p, s
    params["output_weight"] = _lin_w(sd["output_layer.3.weight"])
    params["output_bias"] = _np(sd["output_layer.3.bias"])
    p, s = _bn(sd, "output_layer.4", affine=affine)
    stats["output_bn1d"] = s
    if affine:
        params["output_bn1d"] = p
    return {"params": params, "batch_stats": stats}


def _style_block(sd: dict, prefix: str, spatial: int) -> dict:
    import math

    num_pools = int(math.log2(spatial))
    out = {}
    for i in range(num_pools):
        # torch Sequential alternates Conv2d / LeakyReLU → conv at 2i
        out[f"conv_{i}"] = {
            "weight": _conv_w(sd[f"{prefix}.convs.{2 * i}.weight"]),
            "bias": _np(sd[f"{prefix}.convs.{2 * i}.bias"]),
        }
    out["linear"] = {"weight": _lin_w(sd[f"{prefix}.linear.weight"]),
                     "bias": _np(sd[f"{prefix}.linear.bias"])}
    return out


def convert_encoder_params(state_dict: dict, stylegan_size: int = 1024,
                           num_layers: int = 50, mode: str = "ir_se",
                           kind: str = "gradual") -> dict:
    """pSp ('gradual'), e4e ('e4e') or single-W ('w') encoder → flax variables."""
    import math

    sd = dict(state_dict)
    # encoders take FPN taps: the scan layout covers taps for the 50-layer
    # table only (models/irse.py::IRSEBody docstring)
    body_p, body_s = _body_params(sd, num_layers, mode,
                                  scanned=(num_layers == 50))
    params: dict = {"body": body_p}
    stats: dict = {"body": body_s}

    style_count = 2 * int(math.log2(stylegan_size)) - 2
    if kind in ("gradual", "e4e"):
        # three vmapped groups (models/encoders.py::_style_groups): stack
        # the per-index torch blocks along axis 0
        groups = {"styles_coarse": (range(0, 3), 16),
                  "styles_middle": (range(3, 7), 32),
                  "styles_fine": (range(7, style_count), 64)}
        for name, (idxs, spatial) in groups.items():
            params[name] = {"blk": _stack_tree(
                [_style_block(sd, f"styles.{i}", spatial) for i in idxs])}
        for name in ("latlayer1", "latlayer2"):
            params[name] = {"weight": _conv_w(sd[f"{name}.weight"]),
                            "bias": _np(sd[f"{name}.bias"])}
    else:  # single-W
        params["linear"] = {"weight": _lin_w(sd["linear.weight"]),
                            "bias": _np(sd["linear.bias"])}
    return {"params": params, "batch_stats": stats}
