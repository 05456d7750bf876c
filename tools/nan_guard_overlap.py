"""Measure the nan-guard de-sync win (VERDICT r4 weak #5 / Next #7).

Builds the 1024² attention trainer (same construction as bench config 5 /
tools/profile_edit.py --what train) and times trainer.run() twice on the
same jitted step: log_every=1 (the old per-step host sync) vs
log_every=N (the r5 guard: one sync per window, host dispatches ahead).

  python tools/nan_guard_overlap.py [--batch 8] [--steps 24] [--size 1024]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--att_layer", type=int, default=13)
    args = ap.parse_args()

    from where2edit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLinStyle,
    )
    from where2edit_tpu.losses.clip_loss import CLIPLoss
    from where2edit_tpu.losses.perceptual import PerceptualLoss
    from where2edit_tpu.models.clip_model import CLIP
    from where2edit_tpu.models.stylegan2 import Generator
    from where2edit_tpu.models.vgg import Vgg16
    from where2edit_tpu.train.attention_trainer import (
        AttentionTrainConfig,
        AttentionTrainer,
    )

    key = jax.random.PRNGKey(0)
    gen = Generator(size=args.size, s2d_octaves=1, dtype=jnp.bfloat16)
    gvars = jax.jit(lambda: gen.init({"params": key, "noise": key},
                                     [jnp.zeros((1, 512))]))()
    clip_model = CLIP()
    clip_vars = jax.jit(lambda: clip_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 77), jnp.int32)))()
    clip_loss = CLIPLoss(clip_model, clip_vars, args.size)
    vgg = Vgg16()
    vgg_vars = jax.jit(lambda: vgg.init(
        jax.random.PRNGKey(6), jnp.zeros((1, 224, 224, 3))))()
    perceptual = PerceptualLoss(vgg, vgg_vars, args.size)

    cap = jax.jit(lambda gv, zz: gen.apply(
        gv, [zz], randomize_noise=False, return_features=True))(
        gvars, jax.random.normal(key, (1, 512)))
    fm = list(cap.feature_map)
    const = gvars["params"]["input"]["input"]
    fm.append(jnp.broadcast_to(const, (1, *const.shape[1:])))
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=gen.n_latent, attention_layer=args.att_layer,
        cluster_layer=args.att_layer, clusters=10, generator_size=args.size)
    mvars = dict(jax.jit(lambda t, s, f: mapper.init(
        {"params": key}, t, s, f, fm[args.att_layer - 1].shape[1],
        deterministic_noise=True))(jnp.zeros((1, 512)), cap.style_vector,
                                   fm))
    mvars["clusters"] = {"initial_state": jax.random.normal(key, (10, 576))}
    bank = jax.random.normal(jax.random.PRNGKey(7), (7, 512))

    cfg = AttentionTrainConfig(
        stylegan_size=args.size, attention_layer=args.att_layer,
        cluster_layer=args.att_layer, batch_size=args.batch,
        step=args.steps, work_in_stylespace=True, remat=True)

    def build():
        return AttentionTrainer(
            cfg, generator=gen, gen_vars=gvars, mapper=mapper,
            mapper_params=mvars["params"],
            encode_image=lambda lv, img: clip_loss.apply_encode_image(
                lv["clip"], img),
            perceptual=lambda lv, a, b_: perceptual.apply(lv["vgg"], a, b_),
            mean_latent=jnp.zeros((1, 512)),
            mapper_extra_variables={"clusters": mvars["clusters"]},
            loss_variables={"clip": clip_vars, "vgg": vgg_vars})

    trainer = build()
    trainer.run(bank, log_every=args.steps)  # warm/compile
    for log_every, label in [(1, "per-step sync (old guard)"),
                             (args.steps, f"sync every {args.steps} (r5)")]:
        t0 = time.time()
        trainer.run(bank, log_every=log_every)
        jax.block_until_ready(jax.tree.leaves(trainer.mapper_params)[0])
        dt = (time.time() - t0) / args.steps
        print(f"log_every={log_every:3d} [{label}]: {dt * 1e3:.1f} ms/step "
              f"= {args.batch / dt:.2f} samples/s")


if __name__ == "__main__":
    main()
