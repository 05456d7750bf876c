"""Smoke coverage for the measurement tools (they rot otherwise).

tools/pallas_bench.py and tools/bf16_sweep.py are TPU-measurement scripts
kept as reproduction harnesses for PERF.md's retired experiments;
profile_edit.py is the live profiler used for every round's perf work, so
it gets a real drive here (tiny size, CPU trace).
"""

import importlib.util
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("what", ["mapper", "synth"])
def test_profile_edit_smoke(monkeypatch, tmp_path, what, capsys):
    """profile_edit --what {mapper,synth} at 64px: builds the models, traces
    one rep, and the trace parser aggregates without crashing."""
    mod = _load("profile_edit")
    monkeypatch.setattr(sys, "argv", [
        "profile_edit.py", "--what", what, "--size", "64",
        "--att_layer", "4", "--batch", "1", "--s2d", "0", "--reps", "1",
        "--out", str(tmp_path)])
    mod.main()
    printed = capsys.readouterr().out
    assert f"[{what}] batch=1" in printed
    assert "ms/step" in printed


@pytest.mark.slow
def test_conv3x3_bench_check(monkeypatch, capsys):
    """conv3x3_bench --check: the fused pallas conv+epilogue kernel matches
    XLA conv + separate epilogue in interpret mode (gates the measurement
    harness behind PERF.md's epilogue-fusion experiment)."""
    mod = _load("conv3x3_bench")
    monkeypatch.setattr(sys, "argv",
                        ["conv3x3_bench.py", "--check", "--check_size", "16"])
    mod.main()
    printed = capsys.readouterr().out
    assert "correctness max" in printed


@pytest.mark.slow
def test_profile_edit_train_smoke(monkeypatch, tmp_path, capsys):
    """profile_edit --what train at 64px: builds the full training step
    (2 capture syntheses + grad-pass masked synthesis + CLIP + VGG +
    backward), runs it twice, traces one rep, and parses the trace."""
    mod = _load("profile_edit")
    monkeypatch.setattr(sys, "argv", [
        "profile_edit.py", "--what", "train", "--size", "64",
        "--att_layer", "4", "--batch", "2", "--remat", "--reps", "1",
        "--out", str(tmp_path)])
    mod.main()
    printed = capsys.readouterr().out
    assert "[train] batch=2 remat=True" in printed
    assert "samples/s" in printed
