"""Phase-1 semantic-region discovery CLI.

↔ attention/clustering_feature.py:237-450 (args :454-501). Samples truncated
latents, collects layer features (+position channels, bilinear x2), fits
k-means, pickles the centers, and renders a cluster-overlay visualization.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.cli.common import build_generator, mean_latent, save_pickle
from where2edit_tpu.editing.clustering import (
    assign_clusters,
    cluster_features,
    kmeans_fit,
)
from where2edit_tpu.ops.interpolate import interpolate_nearest
from where2edit_tpu.utils.images import save_image_grid
from where2edit_tpu.utils.seed import set_random_seed


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str,
                   default="pretrained_models/stylegan2-ffhq-config-f.pt")
    p.add_argument("--stylegan_size", type=int, default=1024)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--attention_layer", type=int, default=13)
    p.add_argument("--cluster_num", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=5)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=200)
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--dp", type=int, default=0,
                   help="shard the feature-collection batch over an "
                        "N-device 'data' mesh (the reference's DDP phase-1, "
                        "clustering_feature.py:237-265; features are "
                        "gathered to the host for k-means exactly as the "
                        "reference gathers to rank 0). -1 = all devices.")
    args = p.parse_args(argv)
    from where2edit_tpu.utils.cache import enable_compile_cache  # noqa: PLC0415

    enable_compile_cache()

    key = set_random_seed(args.seed)
    sharding = None
    if args.dp:
        from where2edit_tpu.parallel.mesh import data_sharding, make_mesh  # noqa: PLC0415

        n_dp = len(jax.devices()) if args.dp == -1 else args.dp
        if n_dp > len(jax.devices()):
            raise SystemExit(f"--dp {n_dp} exceeds the "
                             f"{len(jax.devices())} available devices")
        if args.batch_size % n_dp:
            raise SystemExit(f"--batch_size {args.batch_size} not divisible "
                             f"by --dp {n_dp}")
        mesh = make_mesh(data=n_dp)
        sharding = data_sharding(mesh, 2)
        print(f"[dp] {n_dp}-device data mesh: {mesh}")
    gen, gvars, _ = build_generator(args.stylegan_size, args.ckpt,
                                    args.channel_multiplier)
    key, k = jax.random.split(key)
    mean_w = mean_latent(gen, gvars, k)

    # gvars/mean_w as jit ARGUMENTS, not closed-over constants — constant
    # trees compile ~100x slower on the remote-compile backend (PERF.md)
    @jax.jit
    def collect(gvars, mean_w, z):
        out = gen.apply(gvars, [z], truncation=args.truncation,
                        truncation_latent=mean_w, return_latents=True,
                        randomize_noise=False)
        out = gen.apply(gvars, [out.latent], input_is_latent=True,
                        randomize_noise=False, return_features=True)
        blend = out.feature_map[args.attention_layer - 1]
        return cluster_features(blend, upsample2=True), out.image

    feats = []
    for _ in range(args.step):
        key, k = jax.random.split(key)
        z = jax.random.normal(k, (args.batch_size, 512))
        if sharding is not None:
            z = jax.device_put(z, sharding)
        cf, _ = collect(gvars, mean_w, z)
        feats.append(np.asarray(cf))
    data = np.concatenate(feats, axis=0)
    print(f"clustering matrix: {data.shape}")
    centers = kmeans_fit(data, args.cluster_num)

    os.makedirs(args.results_dir, exist_ok=True)
    out_path = os.path.join(
        args.results_dir,
        f"k_means_layer_{args.attention_layer}_{args.cluster_num}_clusters.pkl")
    save_pickle(centers, out_path)
    print(f"saved centers → {out_path}")

    # visualization overlay (clustering_feature.py:404-450)
    key, k = jax.random.split(key)
    z = jax.random.normal(k, (4, 512))
    out = gen.apply(gvars, [z], truncation=args.truncation,
                    truncation_latent=mean_w, return_latents=True,
                    randomize_noise=False)
    out = gen.apply(gvars, [out.latent], input_is_latent=True,
                    randomize_noise=False, return_features=True)
    blend = out.feature_map[args.attention_layer - 1]
    ids = assign_clusters(blend, jnp.asarray(centers),
                          offset_per_sample=False)
    key, k = jax.random.split(key)
    colors = (jax.random.uniform(k, (args.cluster_num, 3)) - 0.5) * 2
    overlay = colors[ids]  # (4, S, S, 3)
    overlay = interpolate_nearest(overlay, args.stylegan_size)
    blended = overlay * 0.7 + out.image * 0.3
    save_image_grid(np.asarray(out.image),
                    os.path.join(args.results_dir, "final_result.jpg"),
                    nrow=4, scale_each=True)
    save_image_grid(np.asarray(blended),
                    os.path.join(args.results_dir, "final_cluster.jpg"),
                    nrow=4, scale_each=True)
    return out_path


if __name__ == "__main__":
    main()
