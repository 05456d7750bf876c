"""StyleCLIP mapper training CLI.

↔ mapper/scripts/train.py:16-32 + mapper/options/train_options.py:4-50.
Refuses an existing exp_dir, dumps opt.json, runs the Coach.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

from where2edit_tpu.cli.common import build_generator, mean_latent
from where2edit_tpu.cli.run_attention import load_clip
from where2edit_tpu.editing.latent_mappers import (
    FullStyleSpaceMapper,
    LevelsMapper,
    SingleMapper,
    WithoutToRGBStyleSpaceMapper,
)
from where2edit_tpu.losses.clip_loss import CLIPLoss
from where2edit_tpu.models.clip_tokenizer import tokenize
from where2edit_tpu.train.coach import Coach, CoachConfig


MAPPER_TYPES = {
    "SingleMapper": SingleMapper,
    "LevelsMapper": LevelsMapper,
    "FullStyleSpaceMapper": FullStyleSpaceMapper,
    "WithoutToRGBStyleSpaceMapper": WithoutToRGBStyleSpaceMapper,
}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--description", type=str, required=True)
    p.add_argument("--mapper_type", type=str, default="LevelsMapper",
                   choices=sorted(MAPPER_TYPES))
    p.add_argument("--no_coarse_mapper", action="store_true")
    p.add_argument("--no_medium_mapper", action="store_true")
    p.add_argument("--no_fine_mapper", action="store_true")
    p.add_argument("--work_in_stylespace", action="store_true")
    p.add_argument("--latents_train_path", type=str, default=None)
    p.add_argument("--latents_test_path", type=str, default=None)
    p.add_argument("--train_dataset_size", type=int, default=5000)
    p.add_argument("--test_dataset_size", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--test_batch_size", type=int, default=1)
    p.add_argument("--checkpoint_path", type=str, default=None,
                   help="warm-start the mapper from a previous training "
                        "checkpoint: a native coach checkpoint dir, or a "
                        "torch StyleCLIP checkpoint "
                        "(mapper/styleclip_mapper.py:38-42)")
    p.add_argument("--resume", type=str, default=None,
                   help="FULL resume from a native coach checkpoint dir "
                        "(weights + optimizer state + step) — e.g. the "
                        "'preempt' snapshot a SIGTERM leaves behind")
    p.add_argument("--learning_rate", type=float, default=0.5)
    p.add_argument("--optim_name", type=str, default="ranger")
    p.add_argument("--id_lambda", type=float, default=0.1)
    p.add_argument("--clip_lambda", type=float, default=1.0)
    p.add_argument("--latent_l2_lambda", type=float, default=0.8)
    p.add_argument("--stylegan_size", type=int, default=1024)
    p.add_argument("--stylegan_weights", type=str,
                   default="pretrained_models/stylegan2-ffhq-config-f.pt")
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--ir_se50_weights", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=50000)
    p.add_argument("--board_interval", type=int, default=50)
    p.add_argument("--image_interval", type=int, default=100)
    p.add_argument("--save_interval", type=int, default=None)
    p.add_argument("--val_interval", type=int, default=2000)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 synthesis during training (losses stay fp32)")
    p.add_argument("--s2d_octaves", type=int, default=1,
                   help="run the final N decoder octaves space-to-depth "
                        "(exact layout transformation, tests/test_s2d.py; "
                        "fills the MXU tiles the 32-channel full-res convs "
                        "waste — measured +40%% training samples/s at 1024 "
                        "on the attention trainer, PERF.md). 0 disables.")
    p.add_argument("--use_mesh", action="store_true",
                   help="shard the batch over a data mesh spanning all "
                        "devices (the reference's multi-GPU DDP analogue)")
    return p


def load_warmstart_mapper_params(args) -> dict:
    """Mapper weights for ``--checkpoint_path`` warm-start.

    The reference loads ``get_keys(ckpt, 'mapper')`` into the fresh mapper
    before training when ``checkpoint_path`` is set
    (mapper/styleclip_mapper.py:38-42). Accepts a native coach checkpoint
    dir (train/checkpoints.py layout) or a torch StyleCLIP training
    checkpoint; torch conversion covers the two mapper types the
    reference's StyleCLIPMapper accepts (SingleMapper/LevelsMapper,
    styleclip_mapper.py:27-35).
    """
    path = args.checkpoint_path
    if os.path.isdir(path):
        from where2edit_tpu.train.checkpoints import load_checkpoint  # noqa: PLC0415

        tree, _ = load_checkpoint(path)
        return tree["mapper"] if "mapper" in tree else tree
    from where2edit_tpu.cli.common import load_torch_state  # noqa: PLC0415
    from where2edit_tpu.models.psp import get_keys  # noqa: PLC0415

    ckpt = load_torch_state(path)
    sd = get_keys(ckpt, "mapper") if "state_dict" in ckpt else ckpt
    if args.mapper_type == "LevelsMapper":
        from where2edit_tpu.convert.mappers import convert_levels_mapper  # noqa: PLC0415

        return convert_levels_mapper(sd, no_coarse=args.no_coarse_mapper,
                                     no_medium=args.no_medium_mapper,
                                     no_fine=args.no_fine_mapper)
    if args.mapper_type == "SingleMapper":
        from where2edit_tpu.convert.mappers import convert_single_mapper  # noqa: PLC0415

        return convert_single_mapper(sd)
    raise ValueError(
        f"torch warm-start is only defined for SingleMapper/LevelsMapper "
        f"(the reference's StyleCLIPMapper accepts no other type); convert "
        f"{args.mapper_type} to a native checkpoint first")


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.resume and not args.checkpoint_path:
        args.checkpoint_path = args.resume  # weights load shares the path
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()
    if os.path.exists(args.exp_dir):
        raise Exception(f"Oops... {args.exp_dir} already exists")
    os.makedirs(args.exp_dir)
    with open(os.path.join(args.exp_dir, "opt.json"), "w") as f:
        json.dump(vars(args), f, indent=4, sort_keys=True)

    gen, gvars, latent_avg = build_generator(
        args.stylegan_size, args.stylegan_weights,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        s2d_octaves=args.s2d_octaves)
    key = jax.random.PRNGKey(0)
    if latent_avg is None:
        latent_avg = mean_latent(gen, gvars, key)

    mapper_cls = MAPPER_TYPES[args.mapper_type]
    if args.mapper_type == "LevelsMapper":
        mapper = mapper_cls(no_coarse_mapper=args.no_coarse_mapper,
                            no_medium_mapper=args.no_medium_mapper,
                            no_fine_mapper=args.no_fine_mapper)
    else:
        mapper = mapper_cls()

    clip_loss_fn = None
    tokens = None
    if args.clip_lambda > 0:
        clip_model, clip_vars = load_clip(args.clip_ckpt)
        closs = CLIPLoss(clip_model, clip_vars, args.stylegan_size)
        tokens = tokenize([args.description])
        clip_loss_fn = closs

    id_loss_fn = None
    if args.id_lambda > 0 and args.ir_se50_weights:
        from where2edit_tpu.cli.common import load_torch_state  # noqa: PLC0415
        from where2edit_tpu.convert.irse import convert_backbone_params  # noqa: PLC0415
        from where2edit_tpu.losses.id_loss import IDLoss  # noqa: PLC0415
        from where2edit_tpu.models.irse import Backbone  # noqa: PLC0415

        facenet = Backbone(input_size=112, drop_ratio=0.6)
        fvars = jax.tree.map(jnp.asarray, convert_backbone_params(
            load_torch_state(args.ir_se50_weights)))
        id_loss_fn = IDLoss(facenet, fvars)
    elif args.id_lambda > 0:
        print("[warn] id_lambda > 0 but no --ir_se50_weights; disabling IDLoss")

    cfg = CoachConfig(
        exp_dir=args.exp_dir, description=args.description,
        mapper_type=args.mapper_type,
        work_in_stylespace=args.work_in_stylespace,
        batch_size=args.batch_size, test_batch_size=args.test_batch_size,
        train_dataset_size=args.train_dataset_size,
        test_dataset_size=args.test_dataset_size,
        learning_rate=args.learning_rate, optim_name=args.optim_name,
        id_lambda=args.id_lambda if id_loss_fn else 0.0,
        clip_lambda=args.clip_lambda if clip_loss_fn else 0.0,
        latent_l2_lambda=args.latent_l2_lambda,
        stylegan_size=args.stylegan_size, max_steps=args.max_steps,
        board_interval=args.board_interval,
        image_interval=args.image_interval,
        save_interval=args.save_interval, val_interval=args.val_interval,
        use_mesh=args.use_mesh)

    train_latents = test_latents = None
    if args.latents_train_path:
        from where2edit_tpu.cli.common import load_torch_state  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        train_latents = np.asarray(load_torch_state(args.latents_train_path))
    if args.latents_test_path:
        from where2edit_tpu.cli.common import load_torch_state  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        test_latents = np.asarray(load_torch_state(args.latents_test_path))

    mapper_variables = None
    if args.checkpoint_path:
        print(f"Loading from checkpoint: {args.checkpoint_path}")
        mapper_variables = {"params": jax.tree.map(
            jnp.asarray, load_warmstart_mapper_params(args))}

    coach = Coach(cfg, generator=gen, generator_variables=gvars,
                  mapper=mapper, mapper_variables=mapper_variables,
                  clip_loss_fn=clip_loss_fn, id_loss_fn=id_loss_fn,
                  latent_avg=latent_avg, text_tokens=tokens,
                  train_latents=train_latents, test_latents=test_latents)

    if args.resume:
        # full resume (weights already loaded above via checkpoint_path
        # aliasing): optimizer state + step. Distinct from the reference's
        # --checkpoint_path, which is a weights-only warm-start
        # (styleclip_mapper.py:38-42) and stays that way here.
        from flax import serialization  # noqa: PLC0415

        from where2edit_tpu.train.checkpoints import load_checkpoint  # noqa: PLC0415

        tree, _ = load_checkpoint(args.resume)
        if "opt_state" in tree:
            coach.opt_state = serialization.from_state_dict(
                coach.opt_state, tree["opt_state"])
            coach.global_step = int(tree.get("step", 0))
            print(f"restored optimizer state; continuing at step "
                  f"{coach.global_step}")

    # preemption safety (same contract as the other training CLIs):
    # SIGTERM → atomic 'preempt' snapshot at the next step boundary
    import signal  # noqa: PLC0415

    stop = {"flag": False}

    def _on_sigterm(signum, frame):
        stop["flag"] = True
        print("[preempt] SIGTERM — snapshotting at the next step boundary")

    prev = signal.signal(signal.SIGTERM, _on_sigterm)
    try:
        result = coach.train(stop_fn=lambda: stop["flag"])
    finally:
        signal.signal(signal.SIGTERM, prev)
    if result == "preempted":
        print(f"[preempt] snapshot → "
              f"{os.path.join(cfg.exp_dir, 'checkpoints', 'preempt')}")


if __name__ == "__main__":
    main()
