"""Convert reference torch checkpoints → native framework checkpoints.

    python -m where2edit_tpu.cli.convert_weights stylegan2 in.pt out_dir
    python -m where2edit_tpu.cli.convert_weights e4e in.pt out_dir
    python -m where2edit_tpu.cli.convert_weights irse in.pth out_dir
    python -m where2edit_tpu.cli.convert_weights vgg16 in.pth out_dir
    python -m where2edit_tpu.cli.convert_weights clip in.pt out_dir
    python -m where2edit_tpu.cli.convert_weights mapper_style final_mapper.pt out_dir

Covers every external checkpoint the reference needs
(pretrained_models/ReadME.md): stylegan2-ffhq-config-f, e4e/pSp encoders,
model_ir_se50, vgg16, CLIP ViT-B/32, and trained Where2edit mappers.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["stylegan2", "e4e", "psp", "irse",
                                    "vgg16", "clip", "mapper_style",
                                    "mapper_wplus", "levels_mapper"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--attention_layer", type=int, default=13)
    args = p.parse_args(argv)

    from where2edit_tpu.cli.common import load_torch_state
    from where2edit_tpu.train.checkpoints import save_checkpoint

    ckpt = load_torch_state(args.src)
    extras = {}

    if args.kind == "stylegan2":
        from where2edit_tpu.convert.stylegan2 import convert_generator_params

        sd = ckpt.get("g_ema", ckpt)
        tree = convert_generator_params(sd, args.size)
        if "latent_avg" in ckpt:
            extras["latent_avg"] = np.asarray(ckpt["latent_avg"],
                                              dtype=np.float32)
    elif args.kind in ("e4e", "psp"):
        from where2edit_tpu.convert.irse import convert_encoder_params
        from where2edit_tpu.models.psp import get_keys

        kind = "e4e" if args.kind == "e4e" else "gradual"
        tree = convert_encoder_params(get_keys(ckpt, "encoder"),
                                      stylegan_size=args.size, kind=kind)
        if "latent_avg" in ckpt:
            extras["latent_avg"] = np.asarray(ckpt["latent_avg"],
                                              dtype=np.float32)
    elif args.kind == "irse":
        from where2edit_tpu.convert.irse import convert_backbone_params

        tree = convert_backbone_params(ckpt)
    elif args.kind == "vgg16":
        from where2edit_tpu.convert.vgg import convert_vgg16_params

        sd = ckpt.state_dict() if hasattr(ckpt, "state_dict") else ckpt
        tree = convert_vgg16_params(sd)
    elif args.kind == "clip":
        from where2edit_tpu.convert.clip import convert_clip_params

        sd = ckpt.state_dict() if hasattr(ckpt, "state_dict") else ckpt
        tree = convert_clip_params(sd)
    elif args.kind == "mapper_style":
        from where2edit_tpu.convert.mappers import convert_feat_cluster_lin_style

        tree = convert_feat_cluster_lin_style(
            ckpt, attention_layer=args.attention_layer)
    elif args.kind == "mapper_wplus":
        from where2edit_tpu.convert.mappers import convert_feat_cluster_lin

        tree = convert_feat_cluster_lin(
            ckpt, attention_layer=args.attention_layer)
    else:  # levels_mapper (StyleCLIP coach checkpoints)
        from where2edit_tpu.convert.mappers import convert_levels_mapper
        from where2edit_tpu.models.psp import get_keys

        sd = get_keys(ckpt, "mapper") if "state_dict" in ckpt else ckpt
        tree = convert_levels_mapper(sd)

    tree = dict(tree)
    tree.update(extras)
    save_checkpoint(args.dst, tree, opts={"kind": args.kind,
                                          "source": args.src})
    n = sum(x.size for x in
            __import__("jax").tree.leaves(tree))
    print(f"converted {args.kind}: {n} values → {args.dst}")


if __name__ == "__main__":
    main()
