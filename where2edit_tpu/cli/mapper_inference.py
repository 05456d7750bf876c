"""StyleCLIP mapper inference CLI.

↔ mapper/scripts/inference.py:24-110: re-hydrates the opts stored in the
checkpoint (training-time mapper architecture, stylegan size/weights), lets
explicitly-passed CLI flags override them (inference.py:29-32), batch-edits
latents, saves per-image results + latents + stats.txt with mean/std runtime.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.cli.common import build_generator, load_torch_state
from where2edit_tpu.cli.mapper_train import MAPPER_TYPES
from where2edit_tpu.train.checkpoints import load_checkpoint
from where2edit_tpu.utils.images import save_image_grid

# fallbacks when neither the checkpoint opts nor the CLI provide a value
DEFAULTS = {
    "couple_outputs": False,
    "work_in_stylespace": False,
    "mapper_type": "LevelsMapper",
    "no_coarse_mapper": False,
    "no_medium_mapper": False,
    "no_fine_mapper": False,
    "stylegan_size": 1024,
    "stylegan_weights": "pretrained_models/stylegan2-ffhq-config-f.pt",
    "test_batch_size": 2,
    "n_images": None,
}


def build_argparser() -> argparse.ArgumentParser:
    # optional flags default to SUPPRESS: absent flags stay out of the
    # namespace, so checkpoint opts are only overridden when the user
    # actually passed a value (ref merges ckpt opts the same way,
    # mapper/scripts/inference.py:29-32)
    p = argparse.ArgumentParser(argument_default=argparse.SUPPRESS)
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--latents_test_path", type=str, required=True)
    p.add_argument("--couple_outputs", action="store_true")
    p.add_argument("--work_in_stylespace", action="store_true")
    p.add_argument("--mapper_type", type=str)
    p.add_argument("--no_coarse_mapper", action="store_true")
    p.add_argument("--no_medium_mapper", action="store_true")
    p.add_argument("--no_fine_mapper", action="store_true")
    p.add_argument("--stylegan_size", type=int)
    p.add_argument("--stylegan_weights", type=str)
    p.add_argument("--test_batch_size", type=int)
    p.add_argument("--n_images", type=int)
    return p


def resolve_opts(cli_args: dict, ckpt_opts: dict | None) -> dict:
    """DEFAULTS ← checkpoint opts ← explicit CLI flags."""
    opts = dict(DEFAULTS)
    opts.update(ckpt_opts or {})
    opts.update(cli_args)
    return opts


def main(argv=None):
    args = vars(build_argparser().parse_args(argv))
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()

    tree, ckpt_opts = load_checkpoint(args["checkpoint_path"])
    opts = resolve_opts(args, ckpt_opts)

    mapper_type = opts.get("mapper_type", "LevelsMapper")
    mapper_cls = MAPPER_TYPES[mapper_type]
    if mapper_type == "LevelsMapper":
        mapper = mapper_cls(
            no_coarse_mapper=bool(opts.get("no_coarse_mapper")),
            no_medium_mapper=bool(opts.get("no_medium_mapper")),
            no_fine_mapper=bool(opts.get("no_fine_mapper")))
    else:
        mapper = mapper_cls()
    mapper_params = jax.tree.map(jnp.asarray, tree["mapper"])

    gen, gvars, _ = build_generator(int(opts.get("stylegan_size", 1024)),
                                    opts.get("stylegan_weights"))

    latents = np.asarray(load_torch_state(args["latents_test_path"]))
    if opts.get("n_images"):
        latents = latents[: int(opts["n_images"])]

    out_dir = os.path.join(args["exp_dir"], "inference_results")
    os.makedirs(out_dir, exist_ok=True)

    couple = bool(opts.get("couple_outputs"))

    @jax.jit
    def run_on_batch(w):
        delta = mapper.apply({"params": mapper_params}, w)
        w_hat = w + 0.1 * delta
        img = gen.apply(gvars, [w_hat], input_is_latent=True,
                        randomize_noise=False).image
        if couple:
            orig = gen.apply(gvars, [w], input_is_latent=True,
                             randomize_noise=False).image
            return img, w_hat, orig
        return img, w_hat, img

    times = []
    bs = int(opts.get("test_batch_size", 2))
    for i in range(0, len(latents), bs):
        w = jnp.asarray(latents[i: i + bs])
        t0 = time.time()
        img, w_hat, orig = jax.block_until_ready(run_on_batch(w))
        times.append(time.time() - t0)
        for j in range(img.shape[0]):
            if couple:
                # original | edited side by side (inference.py:56-60)
                pair = np.concatenate([np.asarray(orig[j: j + 1]),
                                       np.asarray(img[j: j + 1])])
                save_image_grid(pair,
                                os.path.join(out_dir, f"{i + j:05d}.jpg"),
                                nrow=2)
            else:
                save_image_grid(np.asarray(img[j: j + 1]),
                                os.path.join(out_dir, f"{i + j:05d}.jpg"),
                                nrow=1)
        np.save(os.path.join(out_dir, f"latents_{i:05d}.npy"),
                np.asarray(w_hat))

    stats = (f"Runtime {np.mean(times[1:]):.4f}+-{np.std(times[1:]):.4f}"
             if len(times) > 1 else f"Runtime {times[0]:.4f}")
    with open(os.path.join(out_dir, "stats.txt"), "w") as f:
        f.write(stats)
    print(stats)


if __name__ == "__main__":
    main()
