"""Training harness: optimizers, coach (StyleCLIP), attention trainer, ckpt."""

from where2edit_tpu.train.ranger import ranger
from where2edit_tpu.train.lr import styleclip_lr_schedule

__all__ = ["ranger", "styleclip_lr_schedule"]
# heavyweight trainers (Coach, AttentionTrainer, GANTrainer) import from
# their own modules — keeping them out of the package __init__ keeps
# `import where2edit_tpu.train` light for serving processes
