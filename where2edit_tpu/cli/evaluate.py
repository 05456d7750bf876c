"""Quantitative evaluation CLI.

↔ the reference's (upstream-commented) eval call sites: utils.py:516-551
(cal_evaluation: IS/FID/ID-cosine/CLIP-improvement over random edits) and
utils.py:654-726 (calculate_IOU vs CelebAMask-HQ).

    python -m where2edit_tpu.cli.evaluate edits --ckpt ... --mapper ... \
        --clip_ckpt ... [--inception_ckpt ...] [--iterations 100]
    python -m where2edit_tpu.cli.evaluate iou --ckpt ... --mapper ... \
        --e4e_ckpt ... --img_path ... --label_path ...
"""

from __future__ import annotations

import argparse
import json
import random

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["edits", "iou"])
    p.add_argument("--ckpt", type=str,
                   default="pretrained_models/stylegan2-ffhq-config-f.pt")
    p.add_argument("--mapper", type=str, default=None)
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--ir_se50_weights", type=str, default=None)
    p.add_argument("--inception_ckpt", type=str, default=None)
    p.add_argument("--e4e_ckpt", type=str, default=None)
    p.add_argument("--img_path", type=str,
                   default="face_parsing/Data_preprocessing/test_img")
    p.add_argument("--label_path", type=str,
                   default="face_parsing/Data_preprocessing/test_label")
    p.add_argument("--stylegan_size", type=int, default=1024)
    p.add_argument("--attention_layer", type=int, default=13)
    p.add_argument("--cluster_layer", type=int, default=13)
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--description_dir", type=str, default="celeba-caption")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fp32", action="store_true",
                   help="force full-fp32 synthesis (on TPU the session "
                        "otherwise serves bf16+s2d — demo/app.py "
                        "load_session; use this to reproduce the fp32 "
                        "parity-gate numbers)")
    p.add_argument("--dp", type=int, default=0,
                   help="edits mode: shard each eval batch over an N-device "
                        "data mesh (-1 = all devices) — the reference runs "
                        "its eval distributed too (dist.reduce of counters, "
                        "utils.py:529-533). --batch must divide evenly.")
    return p


def _load_models(args):
    from where2edit_tpu.demo.app import load_session

    session, closs = load_session(args)
    return session, closs


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()
    rng = random.Random(args.seed)
    session, closs = _load_models(args)

    from where2edit_tpu.models.clip_tokenizer import tokenize

    if args.mode == "edits":
        from where2edit_tpu.eval.metrics import EditEvaluator
        from where2edit_tpu.train.corpus import load_corpus

        corpus = load_corpus(args.description_dir, None, None, rng)
        phrases = corpus.phrases or [
            "grey hair", "narrow eyes", "a smiling face", "thick eyebrows"]

        id_extract = None
        if args.ir_se50_weights:
            from where2edit_tpu.cli.common import load_torch_state
            from where2edit_tpu.convert.irse import convert_backbone_params
            from where2edit_tpu.losses.id_loss import IDLoss
            from where2edit_tpu.models.irse import Backbone

            facenet = Backbone(input_size=112, drop_ratio=0.6)
            fvars = jax.tree.map(jnp.asarray, convert_backbone_params(
                load_torch_state(args.ir_se50_weights)))
            id_extract = IDLoss(facenet, fvars).extract_feats

        fid_extract = None
        if args.inception_ckpt:
            from where2edit_tpu.cli.common import load_torch_state
            from where2edit_tpu.convert.inception import convert_inception_params
            from where2edit_tpu.models.inception import InceptionV3
            from where2edit_tpu.ops.interpolate import interpolate_bilinear

            inc = InceptionV3()
            ivars = jax.tree.map(jnp.asarray, convert_inception_params(
                load_torch_state(args.inception_ckpt)))
            inc_apply = jax.jit(lambda x: inc.apply(ivars, x)[0])

            def fid_extract(img):  # noqa: F811
                x = interpolate_bilinear((img + 1) / 2, 299,
                                         align_corners=False)
                return inc_apply(x)

        sharding = None
        if args.dp:
            from where2edit_tpu.parallel.mesh import (  # noqa: PLC0415
                data_sharding,
                make_mesh,
            )

            n_dp = len(jax.devices()) if args.dp == -1 else args.dp
            if n_dp > len(jax.devices()):
                raise SystemExit(f"--dp {n_dp} exceeds the "
                                 f"{len(jax.devices())} available devices")
            if args.batch % n_dp:
                raise SystemExit(f"--batch {args.batch} not divisible by "
                                 f"--dp {n_dp}")
            mesh = make_mesh(data=n_dp)
            sharding = data_sharding(mesh, 3)  # W+ batch (B, L, 512)
            print(f"[mesh] eval batches sharded over data={n_dp}")

        # reuse the session's jitted edit with raw CLIP features
        def edit_fn(key, text_feats):
            session.load_synthetic(key, truncation=args.truncation,
                                   batch=text_feats.shape[0],
                                   sharding=sharding)
            img, _, _ = session._edit(
                text_features=text_feats, attention_text_features=text_feats,
                latent=session.latent, feature_map=session.feature_map,
                mapper_feature_map=session.mapper_feature_map,
                strength_alpha=jnp.float32(0.1),
                attention_threshold=jnp.float32(0.75))
            return session.image, img

        evaluator = EditEvaluator(
            edit_fn=edit_fn, encode_image=closs.encode_image,
            encode_text=closs.encode_text, id_extract=id_extract,
            fid_extract=fid_extract)
        keys = [jax.random.PRNGKey(args.seed * 100_000 + i)
                for i in range(args.iterations)]
        prompts = [
            jnp.asarray(tokenize(
                [phrases[rng.randrange(len(phrases))]
                 for _ in range(args.batch)]))
            for _ in range(args.iterations)
        ]
        result = evaluator.run(keys, prompts)
        print(json.dumps(result, default=float))
        return result

    # --- iou mode
    from where2edit_tpu.cli.common import load_torch_state
    from where2edit_tpu.eval.iou import calculate_iou
    from where2edit_tpu.models.psp import PSp
    from where2edit_tpu.train.datasets import CelebAMaskHQ

    psp = PSp.from_torch_checkpoint(load_torch_state(args.e4e_ckpt),
                                    stylegan_size=args.stylegan_size)
    ds = CelebAMaskHQ(args.img_path, args.label_path)
    if len(ds) == 0:
        raise SystemExit(f"no CelebAMask-HQ data under {args.img_path}")

    # attention-map resolution of tap `attention_layer` (→ 64 for layer 13,
    # matching the reference's hard-coded 64² labels, utils.py:669-671)
    from where2edit_tpu.editing.attention_mappers import tap_resolution
    map_size = tap_resolution(args.attention_layer)

    def invert(img_arr):
        w = psp.encode(jnp.asarray(img_arr[None]))
        return w

    def features(w):
        out = session.generator.apply(
            session.gen_vars, [w], input_is_latent=True,
            randomize_noise=False, return_features=True)
        feats = list(out.feature_map)
        const = session.gen_vars["params"]["input"]["input"]
        feats.append(jnp.broadcast_to(const, (w.shape[0], *const.shape[1:])))
        session._last = (out.style_vector, feats)
        return feats

    def mapper_apply(text_feats, latent, feats, bs):
        styles, _ = session._last
        return session.mapper.apply(
            session.mapper_vars, text_feats, styles, feats, bs,
            train=False, finalize=False, deterministic_noise=True)

    pairs = (ds.load(i, 256, map_size) for i in range(min(len(ds), 90)))
    per_class, macro = calculate_iou(
        invert_fn=invert, features_fn=features, mapper_apply=mapper_apply,
        encode_text=closs.encode_text, tokenizer=tokenize,
        attention_layer=args.attention_layer,
        image_label_pairs=pairs)
    print(json.dumps({"per_class_iou": list(map(float, per_class)),
                      "macro_iou": macro}))
    return macro


if __name__ == "__main__":
    main()
