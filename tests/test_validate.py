"""cli/validate.py — the one-command real-weight validation harness, proven
on random-weight torch checkpoints (the adversarial case for parity gates)."""

import json
import os

import pytest
import torch

from oracle import ref_attention_model, require_reference


@pytest.mark.slow
def test_validate_harness_on_random_checkpoints(tmp_path):
    require_reference()
    ref = ref_attention_model()

    # --- g_ema checkpoint (size 64 for speed) ---
    torch.manual_seed(3)
    tgen = ref.Generator(64, 512, 8, channel_multiplier=2)
    g_path = tmp_path / "g_ema.pt"
    torch.save({"g_ema": tgen.state_dict()}, g_path)

    # --- ir_se50 checkpoint ---
    from models.facial_recognition.model_irse import Backbone  # ref import

    tnet = Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                    mode="ir_se")
    ir_path = tmp_path / "ir_se50.pth"
    torch.save(tnet.state_dict(), ir_path)

    # --- e4e checkpoint (encoder.* + decoder.* + latent_avg, pSp layout) ---
    import argparse

    from models.encoders import psp_encoders  # ref import

    tenc = psp_encoders.Encoder4Editing(
        50, "ir_se", argparse.Namespace(stylegan_size=64))
    e4e_sd = {f"encoder.{k}": v for k, v in tenc.state_dict().items()}
    e4e_sd.update({f"decoder.{k}": v for k, v in tgen.state_dict().items()})
    e4e_path = tmp_path / "e4e.pt"
    torch.save({"state_dict": e4e_sd, "latent_avg": torch.randn(10, 512)},
               e4e_path)

    # --- vgg16 features state dict (torchvision layout, random) ---
    convs = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
             (10, 128, 256), (12, 256, 256), (14, 256, 256),
             (17, 256, 512), (19, 512, 512), (21, 512, 512)]
    vgg_sd = {}
    for idx, cin, cout in convs:
        vgg_sd[f"features.{idx}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        vgg_sd[f"features.{idx}.bias"] = torch.randn(cout) * 0.05
    vgg_path = tmp_path / "vgg16.pt"
    torch.save(vgg_sd, vgg_path)

    from where2edit_tpu.cli import validate as v

    out_path = tmp_path / "report.json"
    rc = v.main(["--g_ema", str(g_path), "--stylegan_size", "64",
                 "--ir_se50", str(ir_path), "--vgg", str(vgg_path),
                 "--e4e", str(e4e_path),
                 "--out", str(out_path)])
    assert rc == 0
    report = json.loads(out_path.read_text())
    assert report["g_ema"]["status"] == "pass"
    assert report["g_ema"]["checks"]["ssim_fp32"] >= 0.99
    assert "ssim_bf16" in report["g_ema"]["checks"]
    assert report["e4e"]["status"] == "pass"
    assert report["e4e"]["checks"]["wplus_row_cosine"] >= 0.999
    assert report["ir_se50"]["status"] == "pass"
    assert report["ir_se50"]["checks"]["embedding_cosine"] >= 0.999
    assert report["vgg"]["status"] == "pass"
    assert report["clip"]["status"] == "skip"
    assert report["mapper"]["status"] == "skip"
    assert report["_summary"]["ok"] is True


def test_patched_cuda_scoped_and_reentrant():
    """ADVICE r2: the oracle's .cuda() monkeypatch restores on exit."""
    from where2edit_tpu.convert.reference_oracle import patched_cuda

    orig_t, orig_m = torch.Tensor.cuda, torch.nn.Module.cuda
    with patched_cuda():
        assert torch.Tensor.cuda is not orig_t
        with patched_cuda():  # reentrant
            t = torch.ones(2)
            assert t.cuda() is t
        assert torch.Tensor.cuda is not orig_t  # still active at depth 1
    assert torch.Tensor.cuda is orig_t
    assert torch.nn.Module.cuda is orig_m


def test_validate_reports_missing_files(tmp_path, capsys):
    from where2edit_tpu.cli import validate as v

    rc = v.main(["--g_ema", str(tmp_path / "nope.pt")])
    assert rc == 0  # skips are not failures
    report = json.loads(capsys.readouterr().out)
    assert report["g_ema"]["status"] == "skip"
    assert "not found" in report["g_ema"]["reason"]
    assert report["_summary"]["skip"] == 6
