"""Loss criteria (reference: criteria/ + the InfoNCE consistency loss)."""

from where2edit_tpu.losses.clip_loss import CLIPLoss, clip_image_resize
from where2edit_tpu.losses.id_loss import IDLoss
from where2edit_tpu.losses.perceptual import PerceptualLoss
from where2edit_tpu.losses.infonce import infonce_consistency

__all__ = ["CLIPLoss", "clip_image_resize", "IDLoss", "PerceptualLoss",
           "infonce_consistency"]
