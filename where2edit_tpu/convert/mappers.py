"""Mapper-family torch checkpoint converters.

Covers the StyleCLIP mappers (mapper/latent_mappers.py) and the Where2edit
attention mappers (attention/run_attention.py:45-893), including trained
``final_mapper.pt`` dicts (run_attention.py:1486; ``module.`` DDP prefixes
are stripped like try_demo.py:38-41 does).
"""

from __future__ import annotations

import numpy as np

from where2edit_tpu.convert.stylegan2 import (
    _conv_w,
    _lin_w,
    _np,
    _styled_conv,
)
from where2edit_tpu.editing.attention_mappers import (
    LAYER_NUM,
    STYLE_LAYERS,
    W_CODE_NUM,
)


def strip_ddp_prefix(state_dict: dict) -> dict:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def _equal_linear(sd, prefix):
    return {"weight": _lin_w(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _equal_conv(sd, prefix):
    out = {"weight": _conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _styleclip_mapper(sd, prefix):
    """StyleCLIP Mapper: Sequential [PixelNorm, 4x EqualLinear]."""
    return {f"fc_{i}": _equal_linear(sd, f"{prefix}.mapping.{i + 1}")
            for i in range(4)}


def convert_single_mapper(state_dict: dict) -> dict:
    sd = strip_ddp_prefix(state_dict)
    return {"params": {"mapping": _styleclip_mapper(sd, "mapping")}}


def convert_levels_mapper(state_dict: dict, *, no_coarse=False, no_medium=False,
                          no_fine=False) -> dict:
    sd = strip_ddp_prefix(state_dict)
    params = {}
    if not no_coarse:
        params["course_mapping"] = _styleclip_mapper(sd, "course_mapping")
    if not no_medium:
        params["medium_mapping"] = _styleclip_mapper(sd, "medium_mapping")
    if not no_fine:
        params["fine_mapping"] = _styleclip_mapper(sd, "fine_mapping")
    return {"params": params}


def convert_stylespace_mapper(state_dict: dict, indices) -> dict:
    sd = strip_ddp_prefix(state_dict)
    params = {f"mapper_{c}": _styleclip_mapper(sd, f"mapper_{c}")
              for c in indices}
    return {"params": params}


def convert_feat_cluster_lin(state_dict: dict, attention_layer: int = 11
                             ) -> dict:
    """FullSpaceMapperFEATClusterLin_Net (W+, run_attention.py:449-595)."""
    sd = strip_ddp_prefix(state_dict)
    mapper_layer = W_CODE_NUM[attention_layer]
    params: dict = {"att": {
        "attention_first": _equal_conv(sd, "attention_first"),
        "attention_last": _equal_conv(sd, "attention_last"),
    }}
    n_att = sum(1 for k in sd if k.startswith("attention_")
                and k.endswith(".weight") and k.split(".")[0][10:].isdigit())
    for c in range(n_att):
        params["att"][f"attention_{c}"] = _equal_conv(sd, f"attention_{c}")
    for c in range(mapper_layer):
        for i in range(3):
            params[f"mapper_{c}_fc_{i}"] = _equal_linear(
                sd, f"mapper_{c}.{i + 1}")
    out = {"params": params}
    if "initial_state" in sd:
        out["clusters"] = {"initial_state": _np(sd["initial_state"])}
    return out


def convert_feat_cluster_lin_style(state_dict: dict, attention_layer: int = 11
                                   ) -> dict:
    """FullSpaceMapperFEATClusterLinStyle_Net (S-space,
    run_attention.py:703-893 / utils_demo.py:11-139)."""
    sd = strip_ddp_prefix(state_dict)
    mapper_layer = STYLE_LAYERS[attention_layer]
    params: dict = {
        "attention_textca_first": _equal_linear(sd, "attention_textca_first"),
        "attention_textca_last": _equal_linear(sd, "attention_textca_last"),
        "attention_first": _styled_conv(sd, "attention_first"),
        "attention_last": _styled_conv(sd, "attention_last"),
        "initial_bias": _np(sd["initial_bias"]),
    }
    for c in range(mapper_layer):
        params[f"mapper_{c}"] = _equal_linear(sd, f"mapper_{c}")
        params[f"mapper_text_{c}_0"] = _equal_linear(sd, f"mapper_text_{c}.0")
        params[f"mapper_text_{c}_1"] = _equal_linear(sd, f"mapper_text_{c}.1")
        params[f"mapper_all_{c}"] = _equal_linear(sd, f"mapper_all_{c}")
        # mapper_textca_{c} (CA_NET) exists in checkpoints but is dead code
        # in the reference forward (run_attention.py:813-815) — skipped.
    for c in LAYER_NUM:
        params[f"attention_textca_{c}"] = _equal_linear(
            sd, f"attention_textca_{c}")
        params[f"attention_{c}"] = _styled_conv(sd, f"attention_{c}")
    out = {"params": params}
    if "initial_state" in sd:
        out["clusters"] = {"initial_state": _np(sd["initial_state"])}
    return out
