"""torchvision-layout InceptionV3 state dict → flax variables."""

from __future__ import annotations

from where2edit_tpu.convert.stylegan2 import _conv_w, _lin_w, _np

_BLOCK_BRANCHES = {
    "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"],
    "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
    "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
}
_BLOCK_BRANCHES["Mixed_5c"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_5d"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_6c"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_6d"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_6e"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_7c"] = _BLOCK_BRANCHES["Mixed_7b"]

_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
         "Conv2d_4a_3x3"]


def _basic(sd, prefix):
    params = {"weight": _conv_w(sd[f"{prefix}.conv.weight"]),
              "bn": {"scale": _np(sd[f"{prefix}.bn.weight"]),
                     "bias": _np(sd[f"{prefix}.bn.bias"])}}
    stats = {"bn": {"mean": _np(sd[f"{prefix}.bn.running_mean"]),
                    "var": _np(sd[f"{prefix}.bn.running_var"])}}
    return params, stats


def convert_inception_params(state_dict: dict) -> dict:
    sd = dict(state_dict)
    params: dict = {}
    stats: dict = {}
    for name in _STEM:
        params[name], stats[name] = _basic(sd, name)
    for block, branches in _BLOCK_BRANCHES.items():
        bp, bs = {}, {}
        for br in branches:
            bp[br], bs[br] = _basic(sd, f"{block}.{br}")
        params[block], stats[block] = bp, bs
    params["fc_weight"] = _lin_w(sd["fc.weight"])
    params["fc_bias"] = _np(sd["fc.bias"])
    return {"params": params, "batch_stats": stats}
