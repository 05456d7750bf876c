"""Profile the serving edit step on the real chip and print the op-level
time breakdown (VERDICT round-1 item 5: profile before optimizing).

Runs the interactive edit (mapper + masked 1024² synthesis) under
jax.profiler.trace, then parses the generated .trace.json.gz directly —
no TensorBoard needed — and aggregates device-op self-times by op kind.

    python tools/profile_edit.py [--batch 8] [--what edit|synth|mapper]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from where2edit_tpu.demo.api import one_text_edit  # noqa: E402
from where2edit_tpu.editing.attention_mappers import (  # noqa: E402
    FullSpaceMapperFEATClusterLinStyle,
)
from where2edit_tpu.models.stylegan2 import Generator  # noqa: E402


def build(batch: int, size: int = 1024, att_layer: int = 13,
          s2d_octaves: int = 1, dtype=jnp.bfloat16, fp32_head: int = 0,
          rgb_dtype=jnp.float32):
    gen = Generator(size=size, dtype=dtype, s2d_octaves=s2d_octaves,
                    fp32_head_octaves=fp32_head, rgb_dtype=rgb_dtype)
    key = jax.random.PRNGKey(0)
    gvars = jax.jit(lambda: gen.init({"params": key, "noise": key},
                                     [jnp.zeros((1, 512))]))()
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512))
    out = jax.jit(lambda z: gen.apply(gvars, [z], randomize_noise=False,
                                      return_features=True))(z)
    feats = list(out.feature_map)
    const = gvars["params"]["input"]["input"]
    feats.append(jnp.broadcast_to(const, (batch, *const.shape[1:])))
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=gen.n_latent, attention_layer=att_layer,
        cluster_layer=att_layer, clusters=10, generator_size=size)
    text = jax.random.normal(jax.random.PRNGKey(2), (batch, 512))
    blend = feats[att_layer - 1].shape[1]
    mvars = dict(jax.jit(lambda t, s, f: mapper.init(
        {"params": key}, t, s, f, blend,
        deterministic_noise=True))(text, out.style_vector, feats))
    mvars["clusters"] = {"initial_state": jax.random.normal(key, (10, 576))}
    return gen, gvars, mapper, mvars, text, out, feats, att_layer


def parse_trace(trace_dir: str, top: int = 40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events: aggregate by op name
    by_name = defaultdict(float)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()
                   or "xla" in name.lower()}
    total = 0.0
    details = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        total += e["dur"]
        args = e.get("args") or {}
        d = (args.get("long_name") or args.get("hlo_op")
             or args.get("tf_op") or args.get("source") or "")
        if d and name not in details:
            details[name] = str(d)
    print(f"\n== top ops by accumulated device time "
          f"(total {total / 1e3:.2f} ms across reps) ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3:9.3f} ms  {100 * dur / max(total, 1e-9):5.1f}%  "
              f"{name[:60]}")
        if name in details:
            print(f"             {details[name][:220]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=1024,
                   help="generator resolution (shrink for CPU smoke runs)")
    p.add_argument("--att_layer", type=int, default=13,
                   help="attention/cluster layer (4 pairs with --size 64)")
    p.add_argument("--what",
                   choices=["edit", "synth", "mapper", "invert", "train",
                            "gan"],
                   default="edit")
    p.add_argument("--remat", action="store_true",
                   help="train mode: rematerialize the grad-pass synthesis")
    p.add_argument("--bf16", action="store_true",
                   help="train mode: bf16 synthesis activations")
    p.add_argument("--s2d", type=int, default=1)
    p.add_argument("--fp32_head", type=int, default=0)
    p.add_argument("--rgb_bf16", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--d_microbatch", type=int, default=0,
                   help="gan mode: override the D scan chunk (default "
                        "min(4, batch) — the compile-helper ceiling)")
    p.add_argument("--out", type=str, default="/tmp/w2e_profile")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/w2e_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.what == "train":
        # the attention training step (bench config 5): 2 no-grad capture
        # syntheses + grad-pass masked synthesis + CLIP + VGG + backward
        # through the frozen generator (run_attention.py:1070-1424)
        from where2edit_tpu.losses.clip_loss import CLIPLoss  # noqa: PLC0415
        from where2edit_tpu.losses.perceptual import PerceptualLoss  # noqa: PLC0415
        from where2edit_tpu.models.clip_model import CLIP  # noqa: PLC0415
        from where2edit_tpu.models.vgg import Vgg16  # noqa: PLC0415
        from where2edit_tpu.train.attention_trainer import (  # noqa: PLC0415
            AttentionTrainConfig,
            AttentionTrainer,
        )
        from where2edit_tpu.utils.profiling import sync_fetch  # noqa: PLC0415

        key = jax.random.PRNGKey(0)
        gen = Generator(size=args.size, s2d_octaves=args.s2d,
                        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
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

        z1 = jax.random.normal(key, (1, 512))
        cap = jax.jit(lambda gv, zz: gen.apply(
            gv, [zz], randomize_noise=False, return_features=True))(gvars, z1)
        fm = list(cap.feature_map)
        const = gvars["params"]["input"]["input"]
        fm.append(jnp.broadcast_to(const, (1, *const.shape[1:])))
        mapper = FullSpaceMapperFEATClusterLinStyle(
            layers=gen.n_latent, attention_layer=args.att_layer,
            cluster_layer=args.att_layer, clusters=10,
            generator_size=args.size)
        t1 = jnp.zeros((1, 512))
        mvars = dict(jax.jit(lambda t, s, f: mapper.init(
            {"params": key}, t, s, f, fm[args.att_layer - 1].shape[1],
            deterministic_noise=True))(t1, cap.style_vector, fm))
        mvars["clusters"] = {"initial_state":
                             jax.random.normal(key, (10, 576))}
        bank = jax.random.normal(jax.random.PRNGKey(7), (7, 512))

        cfg = AttentionTrainConfig(
            stylegan_size=args.size, attention_layer=args.att_layer,
            cluster_layer=args.att_layer, batch_size=args.batch, step=100,
            work_in_stylespace=True, remat=args.remat)
        trainer = AttentionTrainer(
            cfg, generator=gen, gen_vars=gvars, mapper=mapper,
            mapper_params=mvars["params"],
            encode_image=lambda lv, img: clip_loss.apply_encode_image(
                lv["clip"], img),
            perceptual=lambda lv, a, b_: perceptual.apply(lv["vgg"], a, b_),
            mean_latent=jnp.zeros((1, 512)),
            mapper_extra_variables={"clusters": mvars["clusters"]},
            loss_variables={"clip": clip_vars, "vgg": vgg_vars})

        state = [trainer.mapper_params, trainer.opt_state]

        def fn():
            res = trainer.step_fn(state[0], state[1], jnp.asarray(1.0),
                                  jax.random.PRNGKey(8), bank)
            state[0], state[1] = res[0], res[1]
            return res[2]["loss"]

        sync_fetch(fn())  # compile
        t0 = time.time()
        sync_fetch(fn())
        dt = time.time() - t0
        print(f"[train] batch={args.batch} remat={args.remat} "
              f"bf16={args.bf16}: {dt * 1e3:.2f} ms/step "
              f"({args.batch / dt:.2f} samples/s, incl. dispatch)")
        with jax.profiler.trace(args.out):
            for _ in range(args.reps):
                sync_fetch(fn())
        parse_trace(args.out)
        return

    if args.what == "gan":
        # the adversarial training iteration at the shipping recipe
        # (bench.py bench_gan; PERF.md "Adversarial (GAN) training step"):
        # per-program wall times for synth_fake / d_step / d_r1 / g_step /
        # g_path / ema, the amortized cadence figure, and a device trace
        # over one full cadence window (VERDICT r4 Next #8).
        from where2edit_tpu.train.gan_trainer import (  # noqa: PLC0415
            GANTrainConfig,
            GANTrainer,
        )
        from where2edit_tpu.utils.profiling import sync_fetch  # noqa: PLC0415

        cfg = GANTrainConfig(
            size=args.size, batch_size=args.batch, bf16=True, remat=True,
            d_bf16=True,
            d_microbatch=args.d_microbatch or min(4, args.batch),
            d_s2d_octaves=2 if args.size >= 64 else 0,
            # b16+ needs the g-side scan chunks too (PERF.md r4b); the
            # path-reg batch stays pinned at 2 (larger path programs crash
            # the compile helper — measured at b32)
            g_microbatch=8 if args.batch >= 16 else 0,
            path_batch_shrink=(args.batch // 2 if args.batch >= 16
                               else 4 if args.batch >= 8 else 2), seed=0)
        tr = GANTrainer(cfg)
        real = jax.random.uniform(jax.random.PRNGKey(9),
                                  (args.batch, args.size, args.size, 3),
                                  minval=-1.0, maxval=1.0)
        # warm both cadences (step 0 hits r1 + path)
        sync_fetch(tr.step(real, jax.random.PRNGKey(1))["g_loss"])
        sync_fetch(tr.step(real, jax.random.PRNGKey(2))["g_loss"])

        def t(label, fn):
            r = fn()
            jax.block_until_ready(jax.tree.leaves(r)[0])
            t0 = time.time()
            r = fn()
            jax.block_until_ready(jax.tree.leaves(r)[0])
            dt = (time.time() - t0) * 1e3
            print(f"  {label:12s} {dt:8.2f} ms")
            return r, dt

        kd = jax.random.PRNGKey(3)

        def snap(tree):  # the step programs DONATE their first two args —
            return jax.tree.map(jnp.copy, tree)  # feed copies, keep tr live

        print(f"[gan] per-program wall times, batch {args.batch}, "
              f"size {args.size} (tpu recipe):")
        fake, t_sf = t("synth_fake", lambda: tr._synth_fake(tr.g_params, kd))
        _, t_d = t("d_step", lambda: tr._d_step(
            snap(tr.d_params), snap(tr.d_opt_state), real, fake)[2])
        _, t_r1 = t("d_r1_step", lambda: tr._d_r1_step(
            snap(tr.d_params), snap(tr.d_opt_state), real)[2])
        _, t_g = t("g_step", lambda: tr._g_step(
            snap(tr.g_params), snap(tr.g_opt_state), tr.d_params, kd)[2])
        _, t_p = t("g_path_step", lambda: tr._g_path_step(
            snap(tr.g_params), snap(tr.g_opt_state), tr.pl_mean, kd)[2])
        _, t_e = t("ema_step", lambda: tr._ema_step(
            snap(tr.g_ema_params), tr.g_params, tr.ema_beta))
        window = cfg.d_reg_every
        per_iter = (t_sf + t_d + t_g + t_e + t_r1 / window
                    + t_p / max(cfg.g_reg_every, 1))
        print(f"  sum-of-parts amortized: {per_iter:.1f} ms/iter = "
              f"{args.batch * 1e3 / per_iter:.2f} imgs/s")

        # measured cadence window for the honest figure
        tr.global_step = 0
        t0 = time.time()
        m = None
        for s in range(window):
            m = tr.step(real, jax.random.PRNGKey(10 + s))
        sync_fetch(m["g_loss"])
        amort = (time.time() - t0) / window
        print(f"  measured window: {amort * 1e3:.1f} ms/iter = "
              f"{args.batch / amort:.2f} imgs/s")

        with jax.profiler.trace(args.out):
            for s in range(window):
                m = tr.step(real, jax.random.PRNGKey(20 + s))
            sync_fetch(m["g_loss"])
        parse_trace(args.out)
        return

    if args.what == "invert":
        # the e2e invert stage: e4e forward over 256² faces → W+
        from where2edit_tpu.models.encoders import Encoder4Editing  # noqa: PLC0415
        from where2edit_tpu.utils.profiling import sync_fetch  # noqa: PLC0415

        e4e = Encoder4Editing(stylegan_size=1024)
        key = jax.random.PRNGKey(0)
        evars = jax.jit(lambda: e4e.init(
            {"params": key}, jnp.zeros((1, 256, 256, 3))))()
        faces = jax.random.normal(key, (args.batch, 256, 256, 3))

        @jax.jit
        def step(ev, img):
            return e4e.apply(ev, img)
        fn = lambda: step(evars, faces)  # noqa: E731

        sync_fetch(fn())
        t0 = time.time()
        sync_fetch(fn())
        print(f"[invert] batch={args.batch}: "
              f"{(time.time() - t0) * 1e3:.2f} ms/step (incl. dispatch)")
        with jax.profiler.trace(args.out):
            for _ in range(args.reps):
                sync_fetch(fn())
        parse_trace(args.out)
        return

    gen, gvars, mapper, mvars, text, out, feats, att = build(
        args.batch, size=args.size, att_layer=args.att_layer,
        s2d_octaves=args.s2d, fp32_head=args.fp32_head,
        rgb_dtype=jnp.bfloat16 if args.rgb_bf16 else jnp.float32)

    # variable trees as jit ARGUMENTS (constants compile ~100x slower here)
    if args.what == "edit":
        from where2edit_tpu.demo.api import subsample_for_mapper  # noqa: PLC0415

        blend = feats[att - 1].shape[1]
        small = jax.jit(lambda fm: subsample_for_mapper(fm, blend))(feats)

        @jax.jit
        def step(gv, mv, text, styles, feats, mfeats):
            img, _, amap, _ = one_text_edit(
                generator=gen, gen_vars=gv, mapper=mapper,
                mapper_vars=mv, text_features=text,
                attention_text_features=text, latent=styles,
                feature_map=feats, mapper_feature_map=mfeats,
                attention_layer=att, work_in_stylespace=True)
            return img, amap
        fn = lambda: step(gvars, mvars, text, out.style_vector, feats, small)  # noqa: E731
    elif args.what == "synth":
        @jax.jit
        def step(gv, styles):
            return gen.apply(gv, styles, input_is_stylespace=True,
                             randomize_noise=False).image
        fn = lambda: step(gvars, out.style_vector)  # noqa: E731
    else:
        blend = feats[att - 1].shape[1]

        @jax.jit
        def step(mv, text, styles, feats):
            return mapper.apply(mv, text, styles, feats, blend,
                                train=False, deterministic_noise=True)
        fn = lambda: step(mvars, text, out.style_vector, feats)  # noqa: E731

    from where2edit_tpu.utils.profiling import sync_fetch  # noqa: E402,PLC0415

    sync_fetch(fn())  # compile
    t0 = time.time()
    sync_fetch(fn())
    print(f"[{args.what}] batch={args.batch} s2d={args.s2d} "
          f"fp32_head={args.fp32_head}: "
          f"{(time.time() - t0) * 1e3:.2f} ms/step (incl. dispatch)")

    # fence each rep with a fetch: block_until_ready resolves early on the
    # axon tunnel, which would exit the trace context before the device
    # finishes and truncate the captured events
    with jax.profiler.trace(args.out):
        for _ in range(args.reps):
            sync_fetch(fn())
    parse_trace(args.out)


if __name__ == "__main__":
    main()
