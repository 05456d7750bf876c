"""torchvision-layout VGG16 state dict → flax params (models.vgg.Vgg16)."""

from where2edit_tpu.convert.stylegan2 import _conv_w, _np
from where2edit_tpu.models.vgg import VGG16_CONVS


def convert_vgg16_params(state_dict: dict) -> dict:
    """Accepts a full torchvision vgg16 dict ('features.N.weight') or one
    already stripped to the features module ('N.weight')."""
    sd = dict(state_dict)
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params = {}
    for idx, _, _ in VGG16_CONVS:
        params[f"conv_{idx}"] = {
            "weight": _conv_w(sd[f"{prefix}{idx}.weight"]),
            "bias": _np(sd[f"{prefix}{idx}.bias"]),
        }
    return {"params": params}
