"""CLI-level behavior: opts re-hydration + full run_attention pipeline."""

import json
import os

import numpy as np
import pytest


def test_mapper_inference_opts_rehydration():
    """Checkpoint opts are re-hydrated and only EXPLICIT CLI flags override
    them (mapper/scripts/inference.py:29-32)."""
    from where2edit_tpu.cli.mapper_inference import (
        build_argparser,
        resolve_opts,
    )

    base = ["--exp_dir", "e", "--checkpoint_path", "c",
            "--latents_test_path", "l"]
    p = build_argparser()

    args = vars(p.parse_args(base))
    ckpt_opts = {"mapper_type": "SingleMapper", "stylegan_size": 256,
                 "no_coarse_mapper": True, "work_in_stylespace": True}
    opts = resolve_opts(args, ckpt_opts)
    assert opts["mapper_type"] == "SingleMapper"
    assert opts["stylegan_size"] == 256
    assert opts["no_coarse_mapper"] is True
    assert opts["work_in_stylespace"] is True

    # explicit CLI flag beats the checkpoint
    args2 = vars(p.parse_args(base + ["--stylegan_size", "1024"]))
    opts2 = resolve_opts(args2, ckpt_opts)
    assert opts2["stylegan_size"] == 1024
    assert opts2["mapper_type"] == "SingleMapper"

    # no checkpoint opts at all → DEFAULTS
    opts3 = resolve_opts(vars(p.parse_args(base)), None)
    assert opts3["mapper_type"] == "LevelsMapper"
    assert opts3["stylegan_size"] == 1024


@pytest.mark.slow
def test_run_attention_cli_end_to_end(tmp_path):
    """Tiny full pipeline run: per-step prompt bank, periodic own-phrase eval
    grids, final render sweep, source snapshot, checkpoints, video.txt
    (reference artifacts: run_attention.py:958-960,1436-1474,1481-1537)."""
    from where2edit_tpu.cli import run_attention as cli

    phrase_file = tmp_path / "phrases.txt"
    phrase_file.write_text("purple hair\nbig eyes\n")
    out_dir = cli.main([
        "--stylegan_size", "32", "--attention_layer", "4",
        "--cluster_layer", "4", "--batch_size", "2", "--step", "2",
        "--save_intermediate_image_every", "2",
        "--work_in_stylespace",
        "--own_description_dir", str(phrase_file),
        "--results_dir", str(tmp_path / "results"),
        "--ckpt", "/nonexistent", "--seed", "1",
    ])

    files = set(os.listdir(out_dir))
    # periodic own-phrase eval grids + final sweep
    assert "00002.jpg" in files and "attention00002.jpg" in files
    assert "final_result.jpg" in files and "final_attention.jpg" in files
    assert "video.txt" in files and "run.log" in files
    # source snapshot (run_attention.py:958-960)
    assert os.path.isfile(os.path.join(
        out_dir, "code", "where2edit_tpu", "train", "attention_trainer.py"))
    # checkpoint with opts persisted
    with open(os.path.join(out_dir, "final_mapper", "opts.json")) as f:
        opts = json.load(f)
    assert opts["stylegan_size"] == 32
    # final grids decode and are non-degenerate
    from PIL import Image

    img = Image.open(os.path.join(out_dir, "final_result.jpg"))
    amap = Image.open(os.path.join(out_dir, "final_attention.jpg"))
    # final_result: originals row + one row per phrase → 3 rows x 4 cols
    assert img.size[0] > img.size[1]
    assert np.asarray(amap).size > 0


@pytest.mark.slow
def test_run_attention_cli_dp_mesh(tmp_path):
    """--dp N shards the training batch over an N-device 'data' mesh from
    the CLI (the reference's 8-way DDP launch, train_scripts.sh:2). Runs on
    the 8-device virtual CPU platform (conftest)."""
    import jax

    from where2edit_tpu.cli import run_attention as cli

    n = len(jax.devices())
    assert n >= 8, "conftest should provision 8 virtual devices"
    out_dir = cli.main([
        "--stylegan_size", "32", "--attention_layer", "4",
        "--cluster_layer", "4", "--batch_size", "8", "--step", "2",
        "--dp", "8",
        "--save_intermediate_image_every", "0",
        "--results_dir", str(tmp_path / "results"),
        "--ckpt", "/nonexistent", "--seed", "3",
    ])
    assert os.path.isdir(os.path.join(out_dir, "final_mapper"))

    # indivisible batch is rejected up front
    with pytest.raises(SystemExit):
        cli.main(["--stylegan_size", "32", "--batch_size", "3", "--dp", "2",
                  "--results_dir", str(tmp_path / "r2"),
                  "--ckpt", "/nonexistent"])


@pytest.mark.slow
def test_run_attention_cli_dp_sp_mesh(tmp_path):
    """--dp 2 --sp 4: the batch shards over 'data' while the generator
    spatially shards the synthesis activations over the 'model' axis
    (GSPMD halo-exchanged convs) — DP x SP from the CLI on one 2D mesh."""
    import jax

    from where2edit_tpu.cli import run_attention as cli

    assert len(jax.devices()) >= 8
    out_dir = cli.main([
        "--stylegan_size", "32", "--attention_layer", "4",
        "--cluster_layer", "4", "--batch_size", "2", "--step", "2",
        "--dp", "2", "--sp", "4",
        "--save_intermediate_image_every", "0",
        "--results_dir", str(tmp_path / "results"),
        "--ckpt", "/nonexistent", "--seed", "3",
    ])
    assert os.path.isdir(os.path.join(out_dir, "final_mapper"))


@pytest.mark.slow
def test_run_attention_cli_latent_path_and_text_condition(tmp_path):
    """--latent_path trains on loaded inverted W+ rows instead of sampled z
    (run_attention.py:1184-1186,1571-1575) and --text_condition conditions
    on corpus-phrase CLIP text encodings (the reference's revived text path,
    run_attention.py:1112-1124)."""
    import torch

    from where2edit_tpu.cli import run_attention as cli

    # a tiny W+ bank (N=5 rows, n_latent=8 at 32px) saved the way the
    # reference expects (.pt tensor)
    lat = torch.randn(5, 8, 512)
    lat_path = tmp_path / "latents.pt"
    torch.save(lat, str(lat_path))

    cap_dir = tmp_path / "celeba-caption"
    cap_dir.mkdir()
    (cap_dir / "0.txt").write_text(
        "She has big eyes, purple hair, and a pointy nose.\n")

    out_dir = cli.main([
        "--stylegan_size", "32", "--attention_layer", "4",
        "--cluster_layer", "4", "--batch_size", "2", "--step", "2",
        "--latent_path", str(lat_path),
        "--text_condition", "--text_bank_size", "6",
        "--description_dir", str(cap_dir),
        "--save_intermediate_image_every", "0",
        "--results_dir", str(tmp_path / "results"),
        "--ckpt", "/nonexistent", "--seed", "5",
    ])
    assert os.path.isdir(os.path.join(out_dir, "final_mapper"))
    with open(os.path.join(out_dir, "final_mapper", "opts.json")) as f:
        opts = json.load(f)
    assert opts["latent_path"] == str(lat_path)
    assert opts["text_condition"] is True
    # W-shaped (N, 512) banks broadcast to W+
    lat2_path = tmp_path / "latents_w.pt"
    torch.save(torch.randn(4, 512), str(lat2_path))
    out_dir2 = cli.main([
        "--stylegan_size", "32", "--attention_layer", "4",
        "--cluster_layer", "4", "--batch_size", "1", "--step", "1",
        "--latent_path", str(lat2_path),
        "--save_intermediate_image_every", "0",
        "--results_dir", str(tmp_path / "results2"),
        "--ckpt", "/nonexistent", "--seed", "6",
    ])
    assert os.path.isdir(os.path.join(out_dir2, "final_mapper"))
