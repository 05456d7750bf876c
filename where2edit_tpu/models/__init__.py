"""Model zoo: StyleGAN2 (+attention fork semantics), encoders, loss backbones."""

from where2edit_tpu.models.stylegan2 import Generator, Discriminator, GeneratorOutput

__all__ = ["Generator", "Discriminator", "GeneratorOutput"]
