"""One-shot text-guided editing CLI.

The reference exposes single-image editing only through the interactive
streamlit demo (show_demo/try_demo.py:56-175); batch editing exists only for
pre-inverted latent banks (mapper/scripts/inference.py). This CLI is the
scriptable union of both: load a face (seeded sample, real image via e4e
inversion, or a saved W+ bank), apply one or more text edits through the
same ``EditSession`` the demos use, and save original/edited/attention
images. Multiple ``--text`` prompts reuse the session's cached feature taps,
so edits after the first run at interactive rates (demo/api.py).

    python -m where2edit_tpu.cli.edit --seed 7 \
        --text "a person with grey hair" --region hair \
        --ckpt pretrained_models/stylegan2-ffhq-config-f.pt \
        --mapper final_mapper.pt --output_dir edits/
"""

from __future__ import annotations

import os
import re
import time

import numpy as np


def _slug(text: str, maxlen: int = 40) -> str:
    s = re.sub(r"[^a-z0-9]+", "_", text.lower()).strip("_")
    return s[:maxlen] or "edit"


def build_argparser():
    from where2edit_tpu.demo.app import REGION_PROMPTS
    from where2edit_tpu.demo.app import build_argparser as demo_argparser

    p = demo_argparser()
    p.description = __doc__
    src = p.add_mutually_exclusive_group()
    src.add_argument("--seed", type=int, default=None,
                     help="sample a synthetic face (try_demo 'Syn' mode)")
    src.add_argument("--image", type=str, nargs="+", default=None,
                     help="real face image(s); requires --e4e_ckpt "
                          "(try_demo 'Real' mode)")
    src.add_argument("--latent", type=str, default=None,
                     help="W+ bank: torch .pt tensor or .npy array "
                          "(B, n_latent, 512)")
    src.add_argument("--celeb", type=str, default=None,
                     help="provided-celebs gallery entry (try_demo.py:"
                          "61-67): name from --celebs_path/--images_dir, "
                          "or 'Celeb N' built-in; 'list' prints names")
    p.add_argument("--text", type=str, nargs="+", default=None,
                   help="edit prompt(s); each produces one edit of the "
                        "same face (required except for '--celeb list')")
    p.add_argument("--region", type=str, default=None,
                   choices=sorted(REGION_PROMPTS),
                   help="fixed attention-region prompt "
                        "(try_demo.py:132-145)")
    p.add_argument("--attention_text", type=str, default=None,
                   help="free-form attention prompt (defaults to --text)")
    p.add_argument("--strength", type=float, default=0.1,
                   help="edit strength α (try_demo slider, [0, 0.3])")
    p.add_argument("--coverage", type=float, default=0.0,
                   help="attention coverage in [0,1]; threshold = "
                        "1 - 0.25*coverage (try_demo.py slider mapping)")
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--batch_prompts", action="store_true",
                   help="run all --text prompts as ONE batched dispatch "
                        "(single-face sources only; throughput mode — "
                        "per-prompt latency is not reported)")
    p.add_argument("--output_dir", type=str, default="edit_results")
    return p


def _load_wplus_bank(path: str):
    if path.endswith((".npy", ".npz")):
        arr = np.load(path)
        if isinstance(arr, np.lib.npyio.NpzFile):
            arr = arr[list(arr.files)[0]]
    else:
        import torch  # noqa: PLC0415

        from where2edit_tpu.cli.common import load_torch_state

        obj = load_torch_state(path)
        if isinstance(obj, dict):  # e.g. saved {"latents": ...}
            obj = next(iter(obj.values()))
        arr = obj.numpy() if isinstance(obj, torch.Tensor) else np.asarray(obj)
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 2:  # single face
        arr = arr[None]
    return arr


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.text is None and args.celeb != "list":
        raise SystemExit("--text is required (except with '--celeb list')")
    if args.image is not None and not args.e4e_ckpt:
        raise SystemExit("--image requires --e4e_ckpt for inversion")
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from where2edit_tpu.demo.app import REGION_PROMPTS, load_session
    from where2edit_tpu.models.clip_tokenizer import tokenize
    from where2edit_tpu.utils.images import save_image_grid

    session, _ = load_session(args)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.image is not None:
        from PIL import Image  # noqa: PLC0415

        from where2edit_tpu.cli.common import load_torch_state
        from where2edit_tpu.models.psp import PSp

        psp = PSp.from_torch_checkpoint(
            load_torch_state(args.e4e_ckpt), stylegan_size=args.stylegan_size)
        xs = []
        for path in args.image:
            img = Image.open(path).convert("RGB").resize((256, 256))
            xs.append(np.asarray(img, np.float32) / 127.5 - 1.0)
        w = psp.encode(jnp.asarray(np.stack(xs)))
        session.load_latent(w)
    elif args.latent is not None:
        session.load_latent(jnp.asarray(_load_wplus_bank(args.latent)))
    elif args.celeb is not None:
        from where2edit_tpu.demo.app import load_gallery  # noqa: PLC0415

        gallery = load_gallery(args, session)
        if args.celeb == "list":
            print("\n".join(gallery.names()))
            return []
        gallery.load(args.celeb)
    else:
        session.load_synthetic(jax.random.PRNGKey(int(args.seed or 0)),
                               truncation=args.truncation)

    batch = int(session.image.shape[0])
    save_image_grid(np.asarray(session.image),
                    os.path.join(args.output_dir, "original.png"), nrow=batch)

    threshold = 1.0 - 0.25 * float(args.coverage)
    results = []
    if args.batch_prompts and len(args.text) > 1:
        if batch != 1:
            raise SystemExit("--batch_prompts needs a single-face source")
        att_prompts = [(REGION_PROMPTS[args.region] if args.region
                        else (args.attention_text or t)) for t in args.text]
        toks = jnp.asarray(tokenize(list(args.text)))
        att = jnp.asarray(tokenize(att_prompts))
        t0 = time.time()
        imgs, amaps = session.edit(toks, att,
                                   strength_alpha=float(args.strength),
                                   attention_threshold=threshold)
        imgs, amaps = np.asarray(imgs), np.asarray(amaps)
        ms = (time.time() - t0) * 1000
        for i, text in enumerate(args.text):
            stem = f"{i:02d}_{_slug(text)}"
            edit_path = os.path.join(args.output_dir, f"edit_{stem}.png")
            att_path = os.path.join(args.output_dir,
                                    f"attention_{stem}.png")
            save_image_grid(imgs[i: i + 1], edit_path, nrow=1)
            save_image_grid(amaps[i: i + 1], att_path, nrow=1,
                            value_range=(0, 1))
            results.append({"text": text, "attention": att_prompts[i],
                            "ms": ms / len(args.text), "edit": edit_path,
                            "attention_map": att_path})
        print(f"[sweep] {len(args.text)} prompts in one dispatch: "
              f"{ms:.0f} ms total ({ms / len(args.text):.1f} ms/prompt)")
        return results
    for i, text in enumerate(args.text):
        att_prompt = (REGION_PROMPTS[args.region] if args.region
                      else (args.attention_text or text))
        # one prompt row per face in the batch (the mapper concatenates
        # text features with per-sample latents)
        toks = jnp.asarray(tokenize([text] * batch))
        att = jnp.asarray(tokenize([att_prompt] * batch))
        t0 = time.time()
        img, amap = session.edit(toks, att,
                                 strength_alpha=float(args.strength),
                                 attention_threshold=threshold)
        img, amap = np.asarray(img), np.asarray(amap)  # fetch = fence
        ms = (time.time() - t0) * 1000
        stem = f"{i:02d}_{_slug(text)}"
        edit_path = os.path.join(args.output_dir, f"edit_{stem}.png")
        att_path = os.path.join(args.output_dir, f"attention_{stem}.png")
        save_image_grid(img, edit_path, nrow=batch)
        save_image_grid(amap, att_path, nrow=batch, value_range=(0, 1))
        print(f"[{i}] {text!r} (attention: {att_prompt!r}) "
              f"{ms:.0f} ms → {edit_path}")
        results.append({"text": text, "attention": att_prompt, "ms": ms,
                        "edit": edit_path, "attention_map": att_path})
    return results


if __name__ == "__main__":
    main()
