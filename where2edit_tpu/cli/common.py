"""Shared CLI plumbing: checkpoint loading + model construction."""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from where2edit_tpu.convert.stylegan2 import convert_generator_params
from where2edit_tpu.models.stylegan2 import Generator


def snapshot_sources(output_dir: str) -> str:
    """Copy the framework sources into the run dir for reproducibility
    (the reference copies its scripts per run, run_attention.py:958-960)."""
    import shutil  # noqa: PLC0415

    import where2edit_tpu  # noqa: PLC0415

    pkg_root = os.path.dirname(os.path.abspath(where2edit_tpu.__file__))
    code_dir = os.path.join(output_dir, "code", "where2edit_tpu")
    shutil.copytree(
        pkg_root, code_dir, dirs_exist_ok=True,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so"))
    return code_dir


def load_torch_state(path: str):
    """torch.load without needing CUDA; returns the raw object."""
    import torch  # noqa: PLC0415

    return torch.load(path, map_location="cpu", weights_only=False)


def build_generator(size: int, ckpt_path: str | None,
                    channel_multiplier: int = 2,
                    dtype: jnp.dtype = jnp.float32, s2d_octaves: int = 0,
                    rgb_dtype: jnp.dtype = jnp.float32,
                    spatial_mesh=None, spatial_axis: str = "sp"):
    """Generator + variables (converted from a rosinality checkpoint when
    given, random init otherwise) + mean latent helper.

    ``dtype=jnp.bfloat16`` is the train-time AMP analogue (reference opt-in
    --amp, run_attention.py:1068-1069): synthesis activations run in bf16
    while params, demodulation and the RGB chain stay fp32.
    ``spatial_mesh``/``spatial_axis``: spatially shard the synthesis
    activations along H over that mesh axis (GSPMD halo-exchanged convs,
    models/stylegan2.py).
    """
    gen = Generator(size=size, channel_multiplier=channel_multiplier,
                    dtype=dtype, s2d_octaves=s2d_octaves,
                    rgb_dtype=rgb_dtype, spatial_mesh=spatial_mesh,
                    spatial_axis=spatial_axis)
    if ckpt_path and os.path.isfile(ckpt_path):
        ckpt = load_torch_state(ckpt_path)
        sd = ckpt.get("g_ema", ckpt)
        variables = jax.tree.map(
            jnp.asarray, convert_generator_params(sd, size))
        latent_avg = ckpt.get("latent_avg")
        latent_avg = (jnp.asarray(np.asarray(latent_avg))
                      if latent_avg is not None else None)
    else:
        key = jax.random.PRNGKey(0)
        variables = jax.jit(lambda: gen.init({"params": key, "noise": key},
                                             [jnp.zeros((1, 512))]))()
        latent_avg = None
    return gen, variables, latent_avg


def mean_latent(gen, variables, key, n: int = 4096) -> jnp.ndarray:
    return gen.apply(variables, key, n, method=Generator.mean_latent)


def save_pickle(obj, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_cluster_centers(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        centers = pickle.load(f)
    if hasattr(centers, "numpy"):
        centers = centers.numpy()
    return np.asarray(centers, dtype=np.float32)
