"""Streamlit demo app (reference: show_demo/try_demo.py:22-175).

Run: streamlit run where2edit_tpu/demo/app.py -- --ckpt ... --mapper ...
Falls back with a clear message when streamlit isn't installed (use
``python -m where2edit_tpu.demo.server`` for the stdlib web demo).
"""

from __future__ import annotations

import argparse

import numpy as np

# try_demo.py:132-145 — fixed attention-region dropdown
REGION_PROMPTS = {
    "skin": "tanned skin",
    "nose": "narrow nose",
    "eyes": "narrow eyes",
    "eyebrows": "thin eyebrows",
    "ears": "wearing a pair of earrings",
    "mouth": "pink lipsticks",
    "hair": "grey hair",
}


def load_session(args):
    from where2edit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from where2edit_tpu.cli.common import build_generator, load_torch_state
    from where2edit_tpu.cli.run_attention import load_clip
    from where2edit_tpu.convert.mappers import convert_feat_cluster_lin_style
    from where2edit_tpu.demo.api import EditSession
    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLinStyle,
    )
    from where2edit_tpu.losses.clip_loss import CLIPLoss

    # serving policy (PERF.md): bf16 synthesis + bf16 rgb chain + s2d final
    # octave on TPU; fp32 on CPU (s2d's fused 6x6 path is TPU-gated and the
    # visual-parity tests pin fp32 numerics there). --fp32 forces full fp32.
    # On TPU the MXU matmul precision dominates the dtype policy
    # (tools/ssim_ladder_1024.py): --fp32 therefore also raises the default
    # matmul precision so the session is the measured 0.99-SSIM config
    # (fp32/high = SSIM 1.000 at 1024²), overridable via
    # --matmul_precision.
    serve_bf16 = (jax.default_backend() == "tpu"
                  and not getattr(args, "fp32", False))
    prec = getattr(args, "matmul_precision", None)
    if prec is None and getattr(args, "fp32", False):
        prec = "high"
    if prec and prec != "default":
        jax.config.update("jax_default_matmul_precision", prec)
    gen, gvars, _ = build_generator(
        args.stylegan_size, args.ckpt,
        dtype=jnp.bfloat16 if serve_bf16 else jnp.float32,
        s2d_octaves=1 if serve_bf16 else 0,
        rgb_dtype=jnp.bfloat16 if serve_bf16 else jnp.float32)
    clip_model, clip_vars = load_clip(args.clip_ckpt)
    closs = CLIPLoss(clip_model, clip_vars, args.stylegan_size)

    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=gen.n_latent, attention_layer=args.attention_layer,
        cluster_layer=args.cluster_layer,
        generator_size=args.stylegan_size)
    if args.mapper and args.mapper.endswith(".pt"):
        sd = load_torch_state(args.mapper)
        mvars = jax.tree.map(jnp.asarray, convert_feat_cluster_lin_style(
            sd, attention_layer=args.attention_layer))
    elif args.mapper:
        from where2edit_tpu.train.checkpoints import load_checkpoint

        tree, _ = load_checkpoint(args.mapper)
        mvars = {"params": jax.tree.map(jnp.asarray, tree["mapper"])}
        if "clusters" in tree:
            mvars["clusters"] = jax.tree.map(jnp.asarray, tree["clusters"])
    else:
        key = jax.random.PRNGKey(0)
        z = jnp.zeros((1, 512))
        out = jax.jit(lambda z: gen.apply(gvars, [z], randomize_noise=False,
                                          return_features=True))(z)
        feats = list(out.feature_map) + [gvars["params"]["input"]["input"]]
        blend = feats[args.attention_layer - 1].shape[1]
        mvars = jax.jit(lambda t, s, f: mapper.init(
            {"params": key}, t, s, f, blend, deterministic_noise=True))(
            jnp.zeros((1, 512)), out.style_vector, feats)

    session = EditSession(
        generator=gen, gen_vars=gvars, mapper=mapper, mapper_vars=mvars,
        clip_encode_text=closs.encode_text,
        attention_layer=args.attention_layer)
    return session, closs


def load_psp(args):
    """e4e encoder for Real-mode inversion (None when no --e4e_ckpt)."""
    if not getattr(args, "e4e_ckpt", None):
        return None
    from where2edit_tpu.cli.common import load_torch_state
    from where2edit_tpu.models.psp import PSp

    return PSp.from_torch_checkpoint(load_torch_state(args.e4e_ckpt),
                                     stylegan_size=args.stylegan_size)


def load_gallery(args, session, psp=None):
    """Provided-celebs gallery (try_demo.py:61-67 Real-mode default)."""
    from where2edit_tpu.demo.gallery import CelebGallery

    return CelebGallery(
        session, celebs_path=getattr(args, "celebs_path", None),
        images_dir=getattr(args, "images_dir", None),
        psp=psp if psp is not None else load_psp(args))


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str,
                   default="pretrained_models/stylegan2-ffhq-config-f.pt")
    p.add_argument("--mapper", type=str, default=None,
                   help="trained mapper (.pt torch or native ckpt dir)")
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--e4e_ckpt", type=str, default=None)
    p.add_argument("--stylegan_size", type=int, default=1024)
    p.add_argument("--attention_layer", type=int, default=13)
    p.add_argument("--cluster_layer", type=int, default=13)
    p.add_argument("--celebs_path", type=str, default=None,
                   help="example_celebs.pt-style W+ latent pack for the "
                        "provided-celebs gallery")
    p.add_argument("--images_dir", type=str, default=None,
                   help="directory of face images for the gallery "
                        "(e4e-inverted on selection; needs --e4e_ckpt)")
    p.add_argument("--fp32", action="store_true",
                   help="disable the bf16 serving policy: fp32 tensors AND "
                        "'high' (3-pass bf16) matmul precision — the "
                        "measured SSIM>=0.99 config at 1024² (PERF.md)")
    p.add_argument("--matmul_precision", type=str, default=None,
                   choices=["default", "high", "highest"],
                   help="override the TPU matmul precision (default: "
                        "'high' with --fp32, backend default otherwise)")
    return p


def main():
    try:
        import streamlit as st
    except ImportError:
        raise SystemExit(
            "streamlit is not installed; run the stdlib demo instead:\n"
            "  python -m where2edit_tpu.demo.server --help")

    import jax
    import jax.numpy as jnp

    from where2edit_tpu.models.clip_tokenizer import tokenize

    args = build_argparser().parse_args()

    @st.cache_resource
    def _load():
        session, closs = load_session(args)
        return session, closs, load_gallery(args, session)

    session, closs, gallery = _load()
    st.title("Where You Edit is What You Get — TPU")
    mode = st.sidebar.radio("Source", ["Syn", "Real"])
    seed = st.sidebar.number_input("Seed", 0, 10_000, 0)
    prompt = st.text_input("Edit prompt", "a person with grey hair")
    region = st.sidebar.selectbox("Attention region",
                                  list(REGION_PROMPTS.keys()), index=6)
    strength = st.sidebar.slider("Strength α", 0.0, 0.3, 0.1)
    coverage = st.sidebar.slider("Attention coverage", 0.0, 1.0, 0.0)
    threshold = 1.0 - 0.25 * coverage  # try_demo.py slider mapping

    if mode == "Syn":
        session.load_synthetic(jax.random.PRNGKey(int(seed)))
    else:
        # try_demo.py:63-67 — provided images first, upload second
        select = st.sidebar.radio("Use...", ["Provided celebs",
                                             "Your own image"])
        if select == "Provided celebs":
            choose = st.sidebar.selectbox("Which is...", gallery.names())
            gallery.load(choose)
        else:
            uploaded = st.file_uploader("Upload a face")
            if uploaded and args.e4e_ckpt:
                from PIL import Image

                img = Image.open(uploaded).convert("RGB").resize((256, 256))
                x = (np.asarray(img, np.float32) / 127.5 - 1.0)[None]
                w = load_psp(args).encode(jnp.asarray(x))
                session.load_latent(w)

    if session.latent is not None and st.button("Edit"):
        toks = jnp.asarray(tokenize([prompt]))
        att = jnp.asarray(tokenize([REGION_PROMPTS[region]]))
        img, amap = session.edit(toks, att, strength_alpha=float(strength),
                                 attention_threshold=float(threshold))
        c1, c2, c3 = st.columns(3)
        from where2edit_tpu.utils.images import to_uint8

        c1.image(to_uint8(np.asarray(session.image))[0], "original")
        c2.image(to_uint8(np.asarray(img))[0], "edited")
        c3.image(to_uint8(np.asarray(amap), value_range=(0, 1))[0],
                 "attention")


if __name__ == "__main__":
    main()
