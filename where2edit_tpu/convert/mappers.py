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


# -- ablation-family building blocks (run_attention.py:45-163) --------------

def _mapper_net(sd, prefix):
    """Mapper_Net: Sequential [PixelNorm, 4x EqualLinear] (:45-69)."""
    return {f"fc_{i}": _equal_linear(sd, f"{prefix}.mapping.{i + 1}")
            for i in range(4)}


def _mapper_con_net(sd, prefix):
    """MapperCon_Net: text/latent branches + joint head (:72-131)."""
    out = {}
    for i in range(2):
        out[f"text_{i}"] = _equal_linear(sd, f"{prefix}.mapping_text.{i + 1}")
        out[f"latent_{i}"] = _equal_linear(
            sd, f"{prefix}.mapping_latent.{i + 1}")
        out[f"together_{i}"] = _equal_linear(
            sd, f"{prefix}.mapping_together.{i}")
    return out


def _mapper_conlin_net(sd, prefix):
    """MapperConLin_Net: single linear head (:134-163)."""
    return {"together": _equal_linear(sd, f"{prefix}.mapping_together.0")}


def _count_rows(sd, key_fmt: str) -> int:
    n = 0
    while key_fmt.format(n) in sd:
        n += 1
    return n


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


def convert_fullspace(state_dict: dict) -> dict:
    """FullSpaceMapper_Net (run_attention.py:166-185)."""
    sd = strip_ddp_prefix(state_dict)
    n = _count_rows(sd, "mapper_{}.mapping.1.weight")
    return {"params": {f"mapper_{c}": _mapper_net(sd, f"mapper_{c}")
                       for c in range(n)}}


def convert_fullspace_con(state_dict: dict) -> dict:
    """FullSpaceMapperCon_Net (run_attention.py:188-206)."""
    sd = strip_ddp_prefix(state_dict)
    n = _count_rows(sd, "mapper_{}.mapping_text.1.weight")
    return {"params": {f"mapper_{c}": _mapper_con_net(sd, f"mapper_{c}")
                       for c in range(n)}}


def convert_fullspace_att(state_dict: dict) -> dict:
    """FullSpaceMapperAtt_Net (run_attention.py:209-255)."""
    sd = strip_ddp_prefix(state_dict)
    n = _count_rows(sd, "mapper_{}.mapping_text.1.weight")
    params = {f"mapper_{c}": _mapper_con_net(sd, f"mapper_{c}")
              for c in range(n)}
    params["att_0"] = _equal_linear(sd, "mapping_attention.1")
    params["att_1"] = _equal_linear(sd, "mapping_attention.2")
    return {"params": params}


def convert_fullspace_attlin(state_dict: dict) -> dict:
    """FullSpaceMapperAttLin_Net (run_attention.py:258-297)."""
    sd = strip_ddp_prefix(state_dict)
    n = _count_rows(sd, "mapper_{}.mapping_together.0.weight")
    params = {f"mapper_{c}": _mapper_conlin_net(sd, f"mapper_{c}")
              for c in range(n)}
    params["att_0"] = _equal_linear(sd, "mapping_attention.1")
    return {"params": params}


def convert_fullspace_spatiallin(state_dict: dict) -> dict:
    """FullSpaceMapperSpatialLin_Net (run_attention.py:300-369).

    The reference's ``mapping_attention`` head is constructed and evaluated
    but its output is never used in forward (:336-337) — dead parameters,
    dropped here (our module does not declare them)."""
    sd = strip_ddp_prefix(state_dict)
    n = _count_rows(sd, "mapper_{}.mapping_together.0.weight")
    params: dict = {f"mapper_{c}": _mapper_conlin_net(sd, f"mapper_{c}")
                    for c in range(n)}
    for c in range(n - 1):
        params[f"attention_{c}"] = _equal_conv(sd, f"attention_{c}")
    params["attention_last"] = _equal_conv(sd, "attention_last")
    params["proj_text"] = _equal_linear(sd, "proj_text")
    return {"params": params}


def convert_fullspace_featlin(state_dict: dict, attention_layer: int = 11
                              ) -> dict:
    """FullSpaceMapperFEATLin_Net (run_attention.py:372-446).

    Identical parameter layout to FullSpaceMapperFEATClusterLin_Net minus
    the cluster buffer, so the cluster converter handles it directly."""
    return convert_feat_cluster_lin(state_dict, attention_layer)


def convert_attlin_style(state_dict: dict) -> dict:
    """FullSpaceMapperAttLinStyle_Net (run_attention.py:598-642)."""
    sd = strip_ddp_prefix(state_dict)
    n = _count_rows(sd, "mapper_{}.mapping_together.0.weight")
    params = {f"mapper_{c}": _mapper_conlin_net(sd, f"mapper_{c}")
              for c in range(n)}
    params["att_0"] = _equal_linear(sd, "mapping_attention.1")
    return {"params": params}


def convert_featlin_style(state_dict: dict, attention_layer: int = 11
                          ) -> dict:
    """FullSpaceMapperFEATLinStyle_Net (run_attention.py:645-700)."""
    sd = strip_ddp_prefix(state_dict)
    params: dict = {"attention_last": _equal_conv(sd, "attention_last")}
    for c in range(attention_layer):  # mapper_layer = attention_layer (:653)
        for i in range(2):
            params[f"mapper_{c}_fc_{i}"] = _equal_linear(
                sd, f"mapper_{c}.{i + 1}")
    for c in LAYER_NUM:
        params[f"attention_{c}"] = _equal_conv(sd, f"attention_{c}")
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
