"""StyleGAN2 adversarial training CLI — TPU-native extension.

The reference has no GAN-training entry point (its Discriminator is dead
code, SURVEY.md §2.2); this CLI pretrains/finetunes the generator the
framework otherwise only consumes. Flags follow the upstream
rosinality-lineage conventions the reference's checkpoints come from
(pretrained_models/ReadME.md:1) so the hyperparameters transfer, but the
loop itself is the TPU-first ``train/gan_trainer.py`` (jitted step programs,
traced style mixing, GSPMD data parallelism, bf16/remat levers).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from where2edit_tpu.train.datasets import ImageBank
from where2edit_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
from where2edit_tpu.utils.images import save_image_grid
from where2edit_tpu.utils.logging import MetricsWriter
from where2edit_tpu.utils.seed import set_random_seed


def _build_fid_extract(args):
    """Feature extractor for the periodic FID gate: InceptionV3 pool3 when
    a torch checkpoint is given (standard FID), else CLIP image features
    (CLIP-FID — meaningful with real CLIP weights; with none given the
    random-weight run is mechanically valid but only tracks relative drift).
    """
    if args.inception_ckpt:
        from where2edit_tpu.cli.common import load_torch_state  # noqa: PLC0415
        from where2edit_tpu.convert.inception import (  # noqa: PLC0415
            convert_inception_params,
        )
        from where2edit_tpu.models.inception import InceptionV3  # noqa: PLC0415
        from where2edit_tpu.ops.interpolate import (  # noqa: PLC0415
            interpolate_bilinear,
        )

        inc = InceptionV3()
        ivars = jax.tree.map(jnp.asarray, convert_inception_params(
            load_torch_state(args.inception_ckpt)))
        inc_apply = jax.jit(lambda x: inc.apply(ivars, x)[0])
        return lambda img: inc_apply(
            interpolate_bilinear((img + 1) / 2, 299, align_corners=False))

    from where2edit_tpu.cli.run_attention import load_clip  # noqa: PLC0415
    from where2edit_tpu.losses.clip_loss import CLIPLoss  # noqa: PLC0415

    clip_model, clip_vars = load_clip(args.clip_ckpt)
    if not args.clip_ckpt:
        print("[fid] no --inception_ckpt/--clip_ckpt: CLIP-FID with random "
              "weights (relative tracking only)")
    return CLIPLoss(clip_model, clip_vars, args.size).encode_image


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default=None,
                   help="image directory | .npy | .npz of reals "
                        "(N,H,W,3 uint8/float)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train against N random images instead of --data "
                        "(smoke/bring-up only)")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--batch", type=int, default=8,
                   help="GLOBAL batch (sharded over --dp devices)")
    p.add_argument("--iter", type=int, default=800000)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--r1", type=float, default=10.0)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--path_regularize", type=float, default=2.0)
    p.add_argument("--path_batch_shrink", type=int, default=2)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--ema_kimg", type=float, default=10.0)
    p.add_argument("--workers", type=int, default=0,
                   help="decode threads for the async real-image pipeline; "
                        "0 = synchronous per-step loading")
    p.add_argument("--prefetch", type=int, default=3,
                   help="batches kept in flight by the async pipeline")
    p.add_argument("--hflip", action="store_true",
                   help="random horizontal-flip augmentation on reals")
    p.add_argument("--fid_every", type=int, default=0,
                   help="compute FID of the EMA generator every N steps "
                        "(0 disables)")
    p.add_argument("--fid_n", type=int, default=1000,
                   help="samples per side of the FID estimate")
    p.add_argument("--fid_batch", type=int, default=0,
                   help="generation/extraction batch for FID (0 = --batch)")
    p.add_argument("--inception_ckpt", type=str, default=None,
                   help="torch InceptionV3 checkpoint for standard FID")
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="CLIP checkpoint for CLIP-FID (used when no "
                        "--inception_ckpt; random weights if omitted)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 synthesis compute (losses/regularizers fp32)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the generator pass in g_step")
    p.add_argument("--d_bf16", action="store_true",
                   help="bf16 discriminator tower (stddev/losses fp32); "
                        "with --d_remat lifts the 1024² batch ceiling")
    p.add_argument("--d_remat", action="store_true",
                   help="jax.checkpoint each discriminator ResBlock")
    p.add_argument("--d_microbatch", type=int, default=0,
                   help="accumulate D grads over scan chunks of N samples "
                        "(single-chip batch>4 at 1024² needs 4; per-chunk "
                        "minibatch-stddev = the reference's per-GPU DDP)")
    p.add_argument("--g_microbatch", type=int, default=0,
                   help="same scan-chunk accumulation for the G step "
                        "(single-chip batch 16 at 1024²)")
    p.add_argument("--d_s2d_octaves", type=int, default=0,
                   help="space-to-depth the D tower's first N octaves "
                        "(exact; fills MXU lanes at full res)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel over an N-device 'data' mesh "
                        "(-1 = all devices)")
    p.add_argument("--multihost", action="store_true",
                   help="join JAX's multi-host runtime first (replaces the "
                        "reference's NCCL rendezvous); --dp -1 then spans "
                        "every chip in the job")
    p.add_argument("--tpu_recipe", action="store_true",
                   help="apply the measured single-chip 1024² recipe "
                        "(PERF.md): --bf16 --remat --d_bf16 "
                        "--d_microbatch 4 --d_s2d_octaves 2, and "
                        "path_batch_shrink 4 when --batch >= 8")
    p.add_argument("--ckpt", type=str, default=None,
                   help="warm-start generator from converted torch g_ema "
                        "weights (finetune) — see cli/convert_weights.py")
    p.add_argument("--resume", type=str, default="",
                   help="resume from a checkpoint dir written by this CLI")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--results_dir", type=str, default="results/gan")
    p.add_argument("--save_every", type=int, default=10000)
    p.add_argument("--sample_every", type=int, default=1000)
    p.add_argument("--n_sample", type=int, default=16)
    args = p.parse_args(argv)
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()
    set_random_seed(args.seed)

    if args.tpu_recipe:
        # r5 measured recipe (PERF.md "GAN-step roofline closure"):
        # d_microbatch 8 compiles now under bf16+s2d and halves the D
        # per-image cost; g_microbatch 8 + path_shrink 8 unlock b16+
        args.bf16 = args.remat = args.d_bf16 = True
        args.d_microbatch = args.d_microbatch or min(8, args.batch)
        args.d_s2d_octaves = args.d_s2d_octaves or 2
        if args.batch >= 16:
            args.g_microbatch = args.g_microbatch or 8
            if args.path_batch_shrink == 2:
                # pin the path-reg batch to 2: any larger path program
                # crashes the compile helper (measured at b32/shrink 8)
                args.path_batch_shrink = args.batch // 2
        elif args.batch >= 8 and args.path_batch_shrink == 2:
            args.path_batch_shrink = 4
        print("[recipe] bf16+remat G, bf16+s2d(2) D, d_microbatch "
              f"{args.d_microbatch}, g_microbatch {args.g_microbatch}, "
              f"path_batch_shrink {args.path_batch_shrink} (PERF.md)")

    if args.multihost:
        from where2edit_tpu.parallel.mesh import initialize_multihost  # noqa: PLC0415

        if initialize_multihost(force=True):
            print(f"[multihost] process {jax.process_index()}/"
                  f"{jax.process_count()}, {len(jax.devices())} global "
                  "devices")

    mesh = None
    if args.dp:
        from where2edit_tpu.parallel.mesh import make_mesh  # noqa: PLC0415

        n_dp = len(jax.devices()) if args.dp == -1 else args.dp
        if n_dp > len(jax.devices()):
            raise SystemExit(f"--dp {n_dp} exceeds the "
                             f"{len(jax.devices())} available devices")
        if args.batch % n_dp:
            raise SystemExit(f"--batch {args.batch} not divisible by "
                             f"--dp {n_dp}")
        mesh = make_mesh(data=n_dp)
        print(f"[dp] {n_dp}-device data mesh: {mesh}")

    if args.synthetic:
        rng0 = np.random.default_rng(args.seed)
        bank = ImageBank(images=rng0.uniform(
            -1.0, 1.0, (args.synthetic, args.size, args.size, 3)
        ).astype(np.float32))
    elif args.data:
        bank = ImageBank.from_path(args.data, args.size)
    else:
        raise SystemExit("one of --data/--synthetic is required")
    print(f"reals: {len(bank)} images at {args.size}px")

    cfg = GANTrainConfig(
        size=args.size, batch_size=args.batch, lr=args.lr, r1=args.r1,
        d_reg_every=args.d_reg_every, g_reg_every=args.g_reg_every,
        path_regularize=args.path_regularize,
        path_batch_shrink=args.path_batch_shrink, mixing=args.mixing,
        ema_kimg=args.ema_kimg, channel_multiplier=args.channel_multiplier,
        bf16=args.bf16, remat=args.remat, d_bf16=args.d_bf16,
        d_remat=args.d_remat, d_microbatch=args.d_microbatch,
        g_microbatch=args.g_microbatch,
        d_s2d_octaves=args.d_s2d_octaves, seed=args.seed)

    g_vars = None
    if args.ckpt:
        from where2edit_tpu.cli.common import build_generator  # noqa: PLC0415

        _, g_vars, _ = build_generator(args.size, args.ckpt,
                                       args.channel_multiplier,
                                       dtype=jnp.bfloat16 if args.bf16
                                       else jnp.float32)
    trainer = GANTrainer(cfg, mesh=mesh, g_vars=g_vars)

    start = 0
    if args.resume:
        tree, _ = load_checkpoint(args.resume)
        trainer.g_params = tree["g"]
        trainer.d_params = tree["d"]
        trainer.g_ema_params = tree["g_ema"]
        if tree.get("g_noises"):  # empty pytree node ⇒ keep the fresh init
            trainer.g_vars["noises"] = tree["g_noises"]
        trainer.pl_mean = jnp.asarray(tree["pl_mean"])
        start = int(tree.get("step", 0))
        trainer.global_step = start
        # opt states restore positionally onto the freshly-built trees
        from flax import serialization  # noqa: PLC0415

        if "g_opt" in tree:
            trainer.g_opt_state = serialization.from_state_dict(
                trainer.g_opt_state, tree["g_opt"])
            trainer.d_opt_state = serialization.from_state_dict(
                trainer.d_opt_state, tree["d_opt"])
        print(f"resumed from {args.resume} at step {start}")

    os.makedirs(args.results_dir, exist_ok=True)
    metrics_writer = MetricsWriter(os.path.join(args.results_dir, "logs"))
    rng = np.random.default_rng(args.seed + 1)
    flip_rng = np.random.default_rng(args.seed + 5)
    if start:
        # fast-forward the data-stream RNGs so a resumed run continues the
        # index/flip sequence an uninterrupted run would see, instead of
        # replaying the first `start` batches (one integers() + one random()
        # call per batch — exactly what bank.sample/PrefetchLoader draw)
        for _ in range(start):
            rng.integers(0, len(bank), size=args.batch)
            if args.hflip:
                flip_rng.random(args.batch)
    sample_z = jnp.asarray(
        np.random.default_rng(args.seed + 2).standard_normal(
            (args.n_sample, 512), dtype=np.float32))
    sample_fn = jax.jit(lambda gv, z: trainer.generator.apply(
        gv, [z], randomize_noise=False).image)

    loader = None
    if args.workers > 0 or args.hflip:
        from where2edit_tpu.train.loader import PrefetchLoader  # noqa: PLC0415

        loader = PrefetchLoader(
            bank, args.batch, rng=rng, workers=max(args.workers, 1),
            prefetch=args.prefetch, hflip=args.hflip,
            flip_seed=flip_rng, sharding=trainer.real_sharding())
        print(f"[loader] async pipeline: {max(args.workers, 1)} decode "
              f"threads, {args.prefetch} batches in flight"
              + (", hflip" if args.hflip else ""))

    fid_state = None
    if args.fid_every:
        fid_extract = _build_fid_extract(args)
        fb = args.fid_batch or args.batch
        n = max(((args.fid_n + fb - 1) // fb) * fb, fb)  # multiple of fb
        fid_rng = np.random.default_rng(args.seed + 3)

        def real_batch():
            # mirror the training distribution: with --hflip the reals the
            # discriminator sees include flips, so the FID real pool must too
            arr = bank.sample(fid_rng, fb)
            if args.hflip:
                coins = fid_rng.random(fb) < 0.5
                arr = arr.copy()
                arr[coins] = arr[coins][:, :, ::-1, :]
            return arr

        real_feats = np.concatenate([
            np.asarray(fid_extract(jnp.asarray(real_batch())))
            for _ in range(n // fb)], 0)
        # fixed z pool: successive FID evals differ only through the EMA
        # weights, so the curve tracks training, not sampling noise
        fid_z = np.random.default_rng(args.seed + 4).standard_normal(
            (n, 512)).astype(np.float32)
        fid_state = (fid_extract, real_feats, fid_z, fb)

    def fid_eval() -> float:
        from where2edit_tpu.eval.metrics import frechet_distance  # noqa: PLC0415

        extract, real_feats, fid_z, fb = fid_state
        ema_vars = trainer.ema_generator_variables()
        feats = np.concatenate([
            np.asarray(extract(sample_fn(ema_vars,
                                         jnp.asarray(fid_z[i:i + fb]))))
            for i in range(0, len(fid_z), fb)], 0)
        return frechet_distance(real_feats, feats)

    def checkpoint(step: int):
        from flax import serialization  # noqa: PLC0415

        path = os.path.join(args.results_dir, f"ckpt_{step:07d}")
        tree = {
            "g": trainer.g_params, "d": trainer.d_params,
            "g_ema": trainer.g_ema_params,
            "g_opt": serialization.to_state_dict(trainer.g_opt_state),
            "d_opt": serialization.to_state_dict(trainer.d_opt_state),
            "pl_mean": trainer.pl_mean, "step": step,
        }
        if trainer.g_vars.get("noises"):  # omit when empty — orbax can
            # mishandle an empty pytree node, and resume would then install
            # an empty noises collection that breaks generator.apply
            tree["g_noises"] = trainer.g_vars["noises"]
        save_checkpoint(path, tree, opts=vars(args))
        return path

    # preemption safety: SIGTERM checkpoints at the next step boundary and
    # exits cleanly; --resume then continues bit-exact (the per-step RNG key
    # is PRNGKey(seed + step + 1) and the data-stream RNGs fast-forward
    # above) — tests/test_preemption.py
    import signal  # noqa: PLC0415

    stop = {"flag": False}

    def _on_sigterm(signum, frame):
        stop["flag"] = True
        print("[preempt] SIGTERM — checkpointing at the next step boundary")

    signal.signal(signal.SIGTERM, _on_sigterm)

    t0 = time.time()
    try:
        for step in range(start, args.iter):
            if stop["flag"]:
                print(f"[preempt] checkpoint → {checkpoint(step)}")
                return None
            real = (next(loader) if loader is not None
                    else jnp.asarray(bank.sample(rng, args.batch)))
            m = trainer.step(real)
            if step % 10 == 0:
                # metrics are device scalars — only the logging cadence syncs
                m = {k: float(v) for k, v in m.items()}
                rate = args.batch * (step - start + 1) / (time.time() - t0)
                print(f"[{step}] " + " ".join(
                    f"{k}={v:.4f}" for k, v in m.items())
                    + f" ({rate:.1f} imgs/s)")
                for k, v in m.items():
                    metrics_writer.add_scalar(f"train/{k}", v, step)
            if args.fid_every and (step + 1) % args.fid_every == 0:
                fid = fid_eval()
                print(f"[{step + 1}] fid={fid:.3f}")
                metrics_writer.add_scalar("eval/fid", fid, step + 1)
            if args.sample_every and (step + 1) % args.sample_every == 0:
                img = sample_fn(trainer.ema_generator_variables(), sample_z)
                save_image_grid(
                    np.asarray(img, np.float32),
                    os.path.join(args.results_dir,
                                 f"sample_{step + 1:07d}.jpg"),
                    nrow=int(round(args.n_sample ** 0.5)) or 1,
                    scale_each=True)
            if args.save_every and (step + 1) % args.save_every == 0:
                print(f"checkpoint → {checkpoint(step + 1)}")
    finally:
        if loader is not None:
            loader.close()
    final = checkpoint(args.iter)
    print(f"final checkpoint → {final}")
    return final


if __name__ == "__main__":
    main()
