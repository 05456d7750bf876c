"""Drive cli/validate.py end-to-end on torch-random-initialized checkpoints
(VERDICT r4 Next #10).

The released weights cannot enter this zero-egress image, but every parity
gate in the harness compares the jax model against the torch model loaded
with the SAME weights — random weights satisfy the gates wherever a torch
oracle exists (g_ema SSIM, e4e cosine, ir_se50 cosine, vgg cosine), so the
harness itself is proven green end-to-end, not just unit-tested. This
script synthesizes one checkpoint per model class in the exact released
format (pretrained_models/ReadME.md):

  g_ema    {"g_ema": Generator(1024).state_dict(), "latent_avg": ...}
  e4e      pSp ckpt {"state_dict": encoder.*+decoder.*, "latent_avg": ...}
  ir_se50  Backbone(112, 50, 'ir_se').state_dict()
  vgg      torchvision-layout features.N.* conv tensors
  clip     full ViT-B/32 openai-layout state dict
  mapper   FullSpaceMapperFEATClusterLinStyle_Net(18, ...).state_dict()

then runs the validate CLI and writes the report (default
VALIDATE_DRYRUN.json at the repo root).

  python tools/validate_dryrun.py [--out VALIDATE_DRYRUN.json] [--size 1024]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

FIXDIR = "/tmp/w2e_validate_fixtures"


def build_fixtures(size: int):
    import numpy as np
    import torch

    from oracle import ref_run_attention, require_reference

    require_reference()
    os.makedirs(FIXDIR, exist_ok=True)
    paths = {}

    from models.stylegan2 import model as ref_model  # noqa: PLC0415

    n_latent = int(np.log2(size)) * 2 - 2

    # ---- g_ema
    p = os.path.join(FIXDIR, f"g_ema_{size}.pt")
    if not os.path.isfile(p):
        torch.manual_seed(100)
        g = ref_model.Generator(size, 512, 8, channel_multiplier=2)
        torch.save({"g_ema": g.state_dict(),
                    "latent_avg": torch.randn(n_latent, 512) * 0.1}, p)
    paths["g_ema"] = p

    # ---- e4e (pSp-format: encoder.* + decoder.* + latent_avg)
    p = os.path.join(FIXDIR, f"e4e_{size}.pt")
    if not os.path.isfile(p):
        from models.encoders import psp_encoders  # noqa: PLC0415

        torch.manual_seed(101)
        opts = argparse.Namespace(stylegan_size=size)
        enc = psp_encoders.Encoder4Editing(50, "ir_se", opts)
        dec = ref_model.Generator(size, 512, 8, channel_multiplier=2)
        sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
        sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
        torch.save({"state_dict": sd,
                    "latent_avg": torch.randn(n_latent, 512) * 0.1,
                    "opts": {"stylegan_size": size}}, p)
    paths["e4e"] = p

    # ---- ir_se50
    p = os.path.join(FIXDIR, "ir_se50.pth")
    if not os.path.isfile(p):
        from models.facial_recognition import model_irse  # noqa: PLC0415

        torch.manual_seed(102)
        net = model_irse.Backbone(input_size=112, num_layers=50,
                                  drop_ratio=0.6, mode="ir_se")
        torch.save(net.state_dict(), p)
    paths["ir_se50"] = p

    # ---- vgg16 features (torchvision layout, no torchvision needed)
    p = os.path.join(FIXDIR, "vgg16.pt")
    if not os.path.isfile(p):
        torch.manual_seed(103)
        plan = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
                (10, 128, 256), (12, 256, 256), (14, 256, 256),
                (17, 256, 512), (19, 512, 512), (21, 512, 512),
                (24, 512, 512), (26, 512, 512), (28, 512, 512)]
        sd = {}
        for i, cin, cout in plan:
            conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
            sd[f"features.{i}.weight"] = conv.weight.detach()
            sd[f"features.{i}.bias"] = conv.bias.detach()
        torch.save(sd, p)
    paths["vgg"] = p

    # ---- CLIP ViT-B/32 (full geometry, openai state-dict layout — the
    # same naming the scaled-down tests/test_clip_vgg.py oracle proves)
    p = os.path.join(FIXDIR, "clip_vit_b32.pt")
    if not os.path.isfile(p):
        from test_clip_vgg import TorchCLIP  # noqa: PLC0415

        torch.manual_seed(104)
        tmod = TorchCLIP(res=224, patch=32, vw=768, vl=12, tw=512, tl=12,
                         th=8, embed=512, vocab=49408, ctx=77)
        torch.save(tmod.state_dict(), p)
    paths["clip"] = p

    # ---- trained mapper (the paper's S-space production net @ 1024)
    p = os.path.join(FIXDIR, f"final_mapper_{size}.pt")
    if not os.path.isfile(p):
        ra = ref_run_attention()
        torch.manual_seed(105)
        tmod = ra.FullSpaceMapperFEATClusterLinStyle_Net(
            n_latent, in_dim=1024, latent_dim=512, attention_layer=13,
            cluster_layer=13, channel_multiplier=2, clusters=10,
            cluster_dim=512 + 64)
        tmod.store_clusters(torch.randn(10, 512 + 64))
        torch.save(tmod.state_dict(), p)
    paths["mapper"] = p
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "VALIDATE_DRYRUN.json"))
    args = ap.parse_args()

    paths = build_fixtures(args.size)
    from where2edit_tpu.cli import validate

    rc = validate.main([
        "--g_ema", paths["g_ema"], "--e4e", paths["e4e"],
        "--ir_se50", paths["ir_se50"], "--vgg", paths["vgg"],
        "--clip", paths["clip"], "--mapper", paths["mapper"],
        "--mapper_kind", "style", "--stylegan_size", str(args.size),
        "--attention_layer", "13", "--out", args.out,
    ])
    print(f"validate dry-drive rc={rc} → {args.out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
