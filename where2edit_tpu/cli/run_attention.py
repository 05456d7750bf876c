"""Phase-2 region-attention training CLI.

↔ attention/run_attention.py:896-1605 (flags :1549-1605). Orchestrates the
full pipeline: corpus, CLIP text/image encoding, cluster centers, the two
production mappers, the jitted global-batch training step, periodic
checkpoints + image/attention grids + video.txt, and final renders.

Requires converted checkpoints for the generator (--ckpt) and CLIP
(--clip_ckpt); without them this still runs with random weights (smoke mode)
so the pipeline is exercisable on weightless machines.
"""

from __future__ import annotations

import argparse
import datetime
import os
import random
import sys

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.cli.common import (
    build_generator,
    load_cluster_centers,
    load_torch_state,
    mean_latent,
    snapshot_sources,
)
from where2edit_tpu.convert.clip import convert_clip_params
from where2edit_tpu.editing.attention_mappers import (
    FullSpaceMapperFEATClusterLin,
    FullSpaceMapperFEATClusterLinStyle,
    FullSpaceMapperFEATLin,
    FullSpaceMapperFEATLinStyle,
)
from where2edit_tpu.losses.clip_loss import CLIPLoss
from where2edit_tpu.losses.perceptual import PerceptualLoss
from where2edit_tpu.models.clip_model import CLIP
from where2edit_tpu.models.clip_tokenizer import tokenize
from where2edit_tpu.models.vgg import Vgg16
from where2edit_tpu.train.attention_trainer import (
    AttentionTrainConfig,
    AttentionTrainer,
)
from where2edit_tpu.train.checkpoints import save_checkpoint
from where2edit_tpu.train.corpus import ATTENTION_PROMPTS, load_corpus
from where2edit_tpu.utils.images import save_image_grid
from where2edit_tpu.utils.logging import Logger, MetricsWriter
from where2edit_tpu.utils.seed import set_random_seed


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--description_dir", type=str, default="celeba-caption")
    p.add_argument("--description", type=str,
                   default="a person with purple hair")
    p.add_argument("--attention_description", type=str, default="blonde hair")
    p.add_argument("--own_description_dir", type=str,
                   default="my_phras_simple.txt")
    p.add_argument("--ckpt", type=str,
                   default="pretrained_models/stylegan2-ffhq-config-f.pt")
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="openai CLIP ViT-B/32 state dict (.pt)")
    p.add_argument("--vgg_ckpt", type=str, default=None)
    p.add_argument("--stylegan_size", type=int, default=1024)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--attention_layer", type=int, default=8)
    p.add_argument("--use_cluster", action="store_true")
    p.add_argument("--cluster_path", type=str, default=None)
    p.add_argument("--cluster_layer", type=int, default=13)
    p.add_argument("--cluster_num", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=1,
                   help="GLOBAL batch (the reference's is per-GPU)")
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--lambda_ess", type=float, default=0.6)
    p.add_argument("--lambda_sec", type=float, default=0.6)
    p.add_argument("--lambda_id", type=float, default=0.3)
    p.add_argument("--lambda_delta", type=float, default=0.008)
    p.add_argument("--step", type=int, default=300)
    p.add_argument("--latent_path", type=str, default=None,
                   help="train on loaded inverted latents instead of sampled "
                        "z (run_attention.py:1571-1575): a torch .pt / "
                        "native ckpt W+ tensor (N, n_latent, 512) or W "
                        "(N, 512); every synthesis gathers a random row")
    p.add_argument("--text_condition", action="store_true",
                   help="condition on CLIP TEXT encodings of corpus phrases "
                        "instead of image features (opt-in revival of the "
                        "reference's dead text path, run_attention.py:"
                        "1112-1124,1176)")
    p.add_argument("--text_bank_size", type=int, default=256,
                   help="phrases sampled into the text-conditioning bank")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count: shard the global batch "
                        "over an N-device 'data' mesh (the reference's 8-way "
                        "DDP launch, train_scripts.sh:2). -1 = all devices; "
                        "0 = single device. batch_size must divide evenly.")
    p.add_argument("--sp", type=int, default=0,
                   help="spatially shard the synthesis activations over M "
                        "devices ('model' mesh axis; GSPMD halo-exchanged "
                        "convs — no reference analogue, SURVEY.md §2.3). "
                        "Composes with --dp: total devices = dp x sp.")
    p.add_argument("--multihost", action="store_true",
                   help="join the multi-host JAX runtime before building "
                        "the mesh (jax.distributed auto-detect; the TPU "
                        "analogue of the reference's NCCL TCP rendezvous, "
                        "run_attention.py:913-945). With --dp -1 the mesh "
                        "then spans every chip in the job.")
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--work_in_stylespace", action="store_true")
    p.add_argument("--save_intermediate_image_every", type=int, default=20)
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--seed", type=int, default=200)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 synthesis during training (losses/demod stay "
                        "fp32) — the reference's opt-in --amp analogue "
                        "(run_attention.py:1068-1069)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the grad-pass synthesis "
                        "(jax.checkpoint): identical numerics, ~2x step "
                        "time at 8x the per-chip batch (fp32 batch>4/chip "
                        "does not fit without it; measured 4.7 -> 18.3 "
                        "samples/s/chip at batch 8, PERF.md)")
    p.add_argument("--s2d_octaves", type=int, default=1,
                   help="run the final N generator octaves space-to-depth "
                        "(exact weight/layout transformation, "
                        "tests/test_s2d.py) — the full-res 32-channel convs "
                        "run as half-res 128-channel and fill the MXU "
                        "tiles; measured +40%% training samples/s at 1024 "
                        "(PERF.md). 0 disables.")
    return p


def load_clip(clip_ckpt: str | None):
    clip_model = CLIP()
    if clip_ckpt and os.path.isfile(clip_ckpt):
        sd = load_torch_state(clip_ckpt)
        sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
        clip_vars = jax.tree.map(jnp.asarray, convert_clip_params(sd))
    else:
        print("[warn] no CLIP checkpoint — random weights (smoke mode)")
        key = jax.random.PRNGKey(0)
        # jit the init: unjitted init is pathologically slow on remote devices
        clip_vars = jax.jit(lambda: clip_model.init(
            {"params": key}, jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32)))()
    return clip_model, clip_vars


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()
    if args.multihost:
        from where2edit_tpu.parallel.mesh import initialize_multihost  # noqa: PLC0415

        if initialize_multihost(force=True):
            print(f"[multihost] process {jax.process_index()}/"
                  f"{jax.process_count()}: {len(jax.devices())} global "
                  f"devices")
    key = set_random_seed(args.seed)
    rng = random.Random(args.seed)

    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    exp_name = args.description.replace(" ", "-") + "-" + stamp
    output_dir = os.path.join(args.results_dir, "outputs", exp_name)
    os.makedirs(output_dir, exist_ok=True)
    snapshot_sources(output_dir)
    sys.stdout = Logger(sys.stdout, os.path.join(output_dir, "run.log"))
    metrics = MetricsWriter(os.path.join(args.results_dir, "logs", exp_name))
    print("--------args----------")
    for k, v in vars(args).items():
        print(f"{k}: {v}")
    print("--------args----------\n")

    corpus = load_corpus(args.description_dir, None, args.own_description_dir,
                         rng)

    mesh = None
    if args.dp or args.sp:
        from where2edit_tpu.parallel.mesh import make_mesh  # noqa: PLC0415

        n_dev = len(jax.devices())
        n_sp = max(args.sp, 1)
        if n_sp > n_dev:
            raise SystemExit(f"--sp {n_sp} exceeds the {n_dev} available "
                             "devices")
        n_dp = n_dev // n_sp if args.dp == -1 else max(args.dp, 1)
        if n_dp * n_sp > n_dev:
            raise SystemExit(f"--dp {n_dp} x --sp {n_sp} = {n_dp * n_sp} "
                             f"devices, but only {n_dev} are available")
        if args.batch_size % n_dp:
            raise SystemExit(f"--batch_size {args.batch_size} not divisible "
                             f"by --dp {n_dp}")
        mesh = make_mesh(data=n_dp, model=n_sp)
        print(f"[mesh] data={n_dp} x model(sp)={n_sp}: {mesh}")

    gen, gvars, _ = build_generator(
        args.stylegan_size, args.ckpt, args.channel_multiplier,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        s2d_octaves=args.s2d_octaves,
        spatial_mesh=mesh if args.sp else None, spatial_axis="model")
    key, k = jax.random.split(key)
    mean_w = mean_latent(gen, gvars, k)

    clip_model, clip_vars = load_clip(args.clip_ckpt)
    clip_loss = CLIPLoss(clip_model, clip_vars, args.stylegan_size)

    vgg = Vgg16()
    if args.vgg_ckpt and os.path.isfile(args.vgg_ckpt):
        from where2edit_tpu.convert.vgg import convert_vgg16_params  # noqa: PLC0415

        vgg_vars = jax.tree.map(jnp.asarray, convert_vgg16_params(
            load_torch_state(args.vgg_ckpt)))
    else:
        print("[warn] no VGG checkpoint — random weights (smoke mode)")
        vgg_vars = vgg.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 224, 224, 3)))
    perceptual = PerceptualLoss(vgg, vgg_vars, args.stylegan_size)

    latent_bank = None
    if args.latent_path:
        lat = load_torch_state(args.latent_path)
        if isinstance(lat, dict):  # native ckpt {"latents": ...}
            if "latents" not in lat:
                raise SystemExit(
                    f"--latent_path {args.latent_path} is a dict checkpoint "
                    f"without a 'latents' key (keys: {sorted(lat)[:8]}); "
                    "expected a W/W+ tensor or {'latents': tensor}")
            lat = lat["latents"]
        lat = np.asarray(lat, dtype=np.float32)
        if lat.ndim == 2:  # W codes → broadcast to W+
            lat = np.repeat(lat[:, None, :], gen.n_latent, axis=1)
        if (lat.ndim != 3 or lat.shape[1] != gen.n_latent
                or lat.shape[2] != gen.style_dim):
            raise SystemExit(f"--latent_path shape {lat.shape} incompatible "
                             f"with (N, {gen.n_latent}, {gen.style_dim})")
        latent_bank = jnp.asarray(lat)
        print(f"[latent_path] {latent_bank.shape[0]} inverted latents loaded")

    text_bank = None
    if args.text_condition:
        from where2edit_tpu.train.corpus import sample_training_texts  # noqa: PLC0415

        if corpus.phrases:
            # same single/pair mix the reference samples per step
            # (run_attention.py:1112-1124), pre-sampled into a bank the
            # jitted step gathers from
            texts = sample_training_texts(corpus, args.text_bank_size, rng)
        else:
            texts = [args.description]
        # encode in chunks of 64 to bound the CLIP text batch
        chunks = [clip_loss.encode_text(jnp.asarray(tokenize(texts[i:i + 64])))
                  for i in range(0, len(texts), 64)]
        text_bank = jnp.concatenate(chunks, axis=0)
        print(f"[text_condition] bank of {text_bank.shape[0]} phrase "
              f"encodings from {len(corpus.phrases)} corpus phrases")

    clusters = args.cluster_num
    centers = None
    if args.use_cluster and args.cluster_path:
        centers = load_cluster_centers(args.cluster_path)
        clusters = centers.shape[0]

    n_latent = gen.n_latent
    mapper_kwargs = dict(
        layers=n_latent, attention_layer=args.attention_layer,
        channel_multiplier=args.channel_multiplier,
        generator_size=args.stylegan_size)
    if not args.work_in_stylespace and not args.use_cluster:
        mapper = FullSpaceMapperFEATLin(**mapper_kwargs)
    elif not args.work_in_stylespace:
        mapper = FullSpaceMapperFEATClusterLin(
            cluster_layer=args.cluster_layer, clusters=clusters,
            cluster_dim=centers.shape[1] if centers is not None else 576,
            **mapper_kwargs)
    elif args.use_cluster:
        mapper = FullSpaceMapperFEATClusterLinStyle(
            cluster_layer=args.cluster_layer, clusters=clusters,
            cluster_dim=centers.shape[1] if centers is not None else 576,
            **mapper_kwargs)
    else:
        mapper = FullSpaceMapperFEATLinStyle(**mapper_kwargs)

    # representative init inputs
    b = args.batch_size
    key, k = jax.random.split(key)
    z = jax.random.normal(k, (b, 512))
    out = gen.apply(gvars, [z], input_is_latent=False, randomize_noise=False,
                    return_features=True)
    feats = list(out.feature_map)
    const = gvars["params"]["input"]["input"]
    feats.append(jnp.broadcast_to(const, (b, *const.shape[1:])))
    blend_size = feats[args.attention_layer - 1].shape[1]
    text0 = jnp.zeros((b, 512))
    key, k = jax.random.split(key)
    if args.work_in_stylespace:
        mvars = mapper.init({"params": k}, text0, out.style_vector, feats,
                            blend_size, deterministic_noise=True)
    else:
        wplus = jnp.zeros((b, n_latent, 512))
        mvars = mapper.init({"params": k}, text0, wplus, feats, blend_size)
    mvars = dict(mvars)
    if centers is not None:
        mvars["clusters"] = {"initial_state": jnp.asarray(centers)}

    resume_tree = None
    if args.resume:
        from where2edit_tpu.train.checkpoints import load_checkpoint  # noqa: PLC0415

        resume_tree, _ = load_checkpoint(args.resume)
        mvars["params"] = jax.tree.map(jnp.asarray, resume_tree["mapper"])
        print(f"resumed mapper from {args.resume}")

    def encode_image(loss_vars, img):
        return clip_loss.apply_encode_image(loss_vars["clip"], img)

    def perceptual_fn(loss_vars, a, b_):
        return perceptual.apply(loss_vars["vgg"], a, b_)

    cfg = AttentionTrainConfig(
        stylegan_size=args.stylegan_size,
        attention_layer=args.attention_layer,
        cluster_layer=args.cluster_layer, batch_size=b, lr=args.lr,
        lambda_ess=args.lambda_ess, lambda_sec=args.lambda_sec,
        lambda_id=args.lambda_id, lambda_delta=args.lambda_delta,
        step=args.step, truncation=args.truncation,
        work_in_stylespace=args.work_in_stylespace, seed=args.seed,
        remat=args.remat)
    trainer = AttentionTrainer(
        cfg, generator=gen, gen_vars=gvars, mapper=mapper,
        mapper_params=mvars["params"], encode_image=encode_image,
        perceptual=perceptual_fn, mean_latent=mean_w,
        mapper_extra_variables={k_: v for k_, v in mvars.items()
                                if k_ not in ("params",)},
        loss_variables={"clip": clip_vars, "vgg": vgg_vars},
        mesh=mesh, latent_bank=latent_bank, text_bank=text_bank)

    start_step = 0
    if resume_tree is not None and "opt_state" in resume_tree:
        # full resume: optimizer state + step counter (checkpoints written
        # by this CLI carry them; bare mapper trees resume params-only)
        from flax import serialization  # noqa: PLC0415

        trainer.opt_state = serialization.from_state_dict(
            trainer.opt_state, resume_tree["opt_state"])
        start_step = int(resume_tree.get("step", 0))
        print(f"restored optimizer state; continuing at step {start_step}")

    # region-prompt bank: CLIP-encode all fixed prompts ONCE; the jitted
    # step re-samples one per step + row-0 broadcast, so a trained run sees
    # every region prompt (reference re-encodes per step,
    # run_attention.py:1134-1144 — precompute + gather is strictly cheaper)
    att_bank = clip_loss.encode_text(
        jnp.asarray(tokenize(list(ATTENTION_PROMPTS))))

    # --- own-phrase eval renderer (run_attention.py:1436-1474,1481-1537) ---
    phrases_own = corpus.phrases_own
    own_text_feats = (clip_loss.encode_text(jnp.asarray(tokenize(phrases_own)))
                      if phrases_own else None)

    def render_one(g_vars, mparams, extra, text, latents, feats_in):
        """Edit `latents` with one phrase (mapper defaults: in-forward
        ST-threshold + blur, run_attention.py:882-884; no demo threshold).
        All variable trees are jit ARGUMENTS (constants compile ~100x
        slower on this backend)."""
        variables = {"params": mparams, **extra}
        blend = feats_in[args.attention_layer - 1].shape[1]
        if args.work_in_stylespace:
            mo = mapper.apply(variables, text, latents, feats_in, blend,
                              train=False, deterministic_noise=True)
            gen_in = mo.latents
            kw = dict(input_is_latent=False, input_is_stylespace=True)
        else:
            mo = mapper.apply(variables, text, latents, feats_in, blend,
                              train=False)
            gen_in = [latents + mo.latents]
            kw = dict(input_is_latent=True)
        g = gen.apply(g_vars, gen_in, randomize_noise=False,
                      attention_layer=args.attention_layer,
                      attention_map=mo.attention_map,
                      feature_map=feats_in, **kw)
        return g.image, mo.attention_map

    render_one = jax.jit(render_one)

    def _sample_eval(g_vars, mean_w_in, bank, k, batch):
        if bank is not None:
            # --latent_path eval: a random loaded row (ref :1493-1494)
            idx = jax.random.randint(k, (batch,), 0, bank.shape[0])
            w_ev = bank[idx]
        else:
            z_ev = jax.random.normal(k, (batch, 512))
            w = gen.apply(g_vars, z_ev, method=gen.get_latent)
            w = mean_w_in + args.truncation * (w - mean_w_in)
            w_ev = jnp.repeat(w[:, None, :], gen.n_latent, axis=1)
        out_ev = gen.apply(g_vars, [w_ev], input_is_latent=True,
                           randomize_noise=False, return_features=True)
        f_ev = list(out_ev.feature_map)
        c = g_vars["params"]["input"]["input"]
        f_ev.append(jnp.broadcast_to(c, (batch, *c.shape[1:])))
        lat_ev = out_ev.style_vector if args.work_in_stylespace else w_ev
        return out_ev.image, lat_ev, f_ev

    _sample_eval = jax.jit(_sample_eval, static_argnums=(4,))

    def sample_eval_inputs(k, batch):
        """Fresh truncated sample + feature taps (run_attention.py:1492-1512);
        the latent bank rides in as a jit ARGUMENT (never closed over)."""
        return _sample_eval(gvars, mean_w, latent_bank, k, batch)

    def render_phrase_sweep(latents, feats_in, batch):
        """One (edited-img, attention) pair per own phrase."""
        imgs, amaps = [], []
        for p in range(own_text_feats.shape[0]):
            text = jnp.broadcast_to(own_text_feats[p:p + 1], (batch, 512))
            img_p, amap_p = render_one(gvars, trainer.mapper_params,
                                       trainer.mapper_variables_extra,
                                       text, latents, feats_in)
            imgs.append(np.asarray(img_p))
            amaps.append(np.asarray(amap_p))
        return np.concatenate(imgs), np.concatenate(amaps)

    key, k = jax.random.split(key)
    eval_img, eval_latents, eval_feats = sample_eval_inputs(k, 1)

    video_path = os.path.join(output_dir, "video.txt")
    video_f = open(video_path, "w")

    def snapshot_tree(step: int) -> dict:
        """Checkpoint tree carrying everything a bit-exact resume needs
        (params + extra collections + optimizer state + step)."""
        from flax import serialization  # noqa: PLC0415

        return {"mapper": trainer.mapper_params,
                **trainer.mapper_variables_extra,
                "opt_state": serialization.to_state_dict(trainer.opt_state),
                "step": step}

    def callback(i, scal, img, amap):
        for name, v in scal.items():
            metrics.add_scalar(f"loss/{name}", v, i)
        if (args.save_intermediate_image_every > 0
                and (i + 1) % args.save_intermediate_image_every == 0):
            save_checkpoint(
                os.path.join(output_dir, f"{i + 1:05d}_mapper"),
                snapshot_tree(i + 1), opts=vars(args))
            if own_text_feats is not None:
                # periodic own-phrase eval grid (run_attention.py:1436-1474):
                # one row per phrase, fixed eval face — phrases render at
                # batch 1, so nrow=1 keeps the one-row-per-phrase layout
                # regardless of the training batch size
                imgs, amaps = render_phrase_sweep(eval_latents, eval_feats, 1)
                nrow = 1
            else:
                imgs, amaps = np.asarray(img), np.asarray(amap)
                nrow = max(b, 1)
            save_image_grid(imgs,
                            os.path.join(output_dir, f"{i + 1:05d}.jpg"),
                            nrow=nrow, scale_each=True)
            save_image_grid(amaps,
                            os.path.join(output_dir,
                                         f"attention{i + 1:05d}.jpg"),
                            nrow=nrow, value_range=(0, 1))
            video_f.write(f"file ./{i + 1:05d}.jpg\nduration 0.2\n")
        print(f"step {i}: " + "; ".join(f"{k_}={v:.4f}"
                                        for k_, v in scal.items()))

    # preemption safety (SURVEY.md §5: the reference has none): SIGTERM
    # requests a stop at the next step boundary; an atomic snapshot with
    # optimizer state + step is written so --resume continues bit-exact
    # (tests/test_preemption.py)
    import signal  # noqa: PLC0415

    stop = {"flag": False}

    def _on_sigterm(signum, frame):
        stop["flag"] = True
        print("[preempt] SIGTERM — snapshotting at the next step boundary")

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    try:
        trainer.run(att_bank, log_every=1, callback=callback,
                    start_step=start_step, stop_fn=lambda: stop["flag"])
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
    video_f.close()

    if stop["flag"]:
        path = os.path.join(output_dir, "preempt_mapper")
        save_checkpoint(path, snapshot_tree(trainer.steps_completed),
                        opts=vars(args))
        print(f"[preempt] snapshot at step {trainer.steps_completed} → {path}")
        return output_dir

    save_checkpoint(os.path.join(output_dir, "final_mapper"),
                    snapshot_tree(trainer.steps_completed), opts=vars(args))

    if own_text_feats is not None:
        # final sweep (run_attention.py:1481-1537): originals row + one row
        # of edits per own phrase over a fresh batch, plus attention grid
        save_batch = max(1, min(4, 2 * b))
        key, k = jax.random.split(key)
        f_img, f_lat, f_feats = sample_eval_inputs(k, save_batch)
        imgs, amaps = render_phrase_sweep(f_lat, f_feats, save_batch)
        final = np.concatenate([np.asarray(f_img), imgs])
        save_image_grid(final, os.path.join(output_dir, "final_result.jpg"),
                        nrow=save_batch, scale_each=True)
        save_image_grid(amaps,
                        os.path.join(output_dir, "final_attention.jpg"),
                        nrow=save_batch, value_range=(0, 1),
                        scale_each=True)

    print(f"done → {output_dir}")
    return output_dir


if __name__ == "__main__":
    main()
