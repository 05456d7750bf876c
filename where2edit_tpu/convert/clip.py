"""openai CLIP (ViT-B/32) state dict → flax params (models.clip_model.CLIP)."""

from where2edit_tpu.convert.irse import _stack_tree
from where2edit_tpu.convert.stylegan2 import _lin_w, _np


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _block(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "in_proj_weight": _lin_w(sd[f"{prefix}.attn.in_proj_weight"]),
            "in_proj_bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            "out_proj_weight": _lin_w(sd[f"{prefix}.attn.out_proj.weight"]),
            "out_proj_bias": _np(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "mlp_c_fc": {"kernel": _lin_w(sd[f"{prefix}.mlp.c_fc.weight"]),
                     "bias": _np(sd[f"{prefix}.mlp.c_fc.bias"])},
        "mlp_c_proj": {"kernel": _lin_w(sd[f"{prefix}.mlp.c_proj.weight"]),
                       "bias": _np(sd[f"{prefix}.mlp.c_proj.bias"])},
    }


def _transformer(sd, prefix, layers):
    """Blocks stack along axis 0 for the nn.scan Transformer
    (models/clip_model.py)."""
    return {"blocks": {"blk": _stack_tree(
        [_block(sd, f"{prefix}.resblocks.{i}") for i in range(layers)])}}


def convert_clip_params(state_dict: dict, vision_layers: int = 12,
                        text_layers: int = 12) -> dict:
    sd = {k: v for k, v in state_dict.items()}
    params = {
        "visual": {
            "conv1_weight": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0),
            "class_embedding": _np(sd["visual.class_embedding"]),
            "positional_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "ln_post": _ln(sd, "visual.ln_post"),
            "transformer": _transformer(sd, "visual.transformer", vision_layers),
            "proj": _np(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": _np(sd["token_embedding.weight"]),
            "positional_embedding": _np(sd["positional_embedding"]),
            "transformer": _transformer(sd, "transformer", text_layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": _np(sd["text_projection"]),
        },
        "logit_scale": _np(sd["logit_scale"]),
    }
    return {"params": params}
