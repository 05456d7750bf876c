"""bench.py end-to-end smoke (the driver-critical artifact).

The driver runs ``python bench.py`` at the end of every round and records
its single JSON line; a crash there means the round ships no numbers. This
gate runs the WHOLE bench — all training variants plus every serving
config — at 64px on CPU in a subprocess and asserts the contract: exactly
one JSON line on stdout with the four required keys plus the per-config
results.

Compiles dominate the runtime; a persistent compile cache dir keeps reruns
on the same machine fast.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke_cpu_64px(tmp_path):
    env = dict(
        os.environ,
        # JAX_PLATFORMS env alone cannot override the site-pinned platform;
        # W2E_BENCH_PLATFORM routes through the jax config API in bench.py
        JAX_PLATFORMS="cpu",
        W2E_BENCH_PLATFORM="cpu",
        W2E_BENCH_SIZE="64",
        W2E_BENCH_ATT_LAYER="4",
        W2E_BENCH_BATCH="2",
        W2E_JAX_CACHE="/tmp/w2e_cpu_cache",  # persists across runs
        # the ≥0.99-SSIM fp32 serving rows and the upward e2e batch ladder
        # double the stage compiles — both share build_stages with the
        # base rows (same code path) and are exercised on the real chip;
        # the CPU smoke skips them to stay within its budget
        W2E_BENCH_SKIP_FP32="1",
        W2E_BENCH_E2E_BIG="0",
        W2E_BENCH_SKIP_GAN="1",  # own trainer init + 5 programs — the GAN
        # step is gated by tests/test_gan_training.py instead
    )
    # the conftest's 8-device flag must not leak into the subprocess — the
    # bench is a single-chip program
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]

    # contract: stdout is exactly one JSON object line
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in payload, payload

    cfgs = payload["configs"]
    # every BASELINE config must be present (values are 64px-CPU-meaningless;
    # presence + finiteness is the contract)
    for k in (
        "e2e_edits_per_sec_per_chip",
        "synthesis_only_imgs_per_sec_per_chip",
        "styleclip_mapper_edits_per_sec_per_chip",
        "interactive_edits_per_sec_per_chip",
        "e2e_p50_latency_ms_batch1",
        "train_steps_per_sec_per_chip",
        "train_samples_per_sec_per_chip",
    ):
        assert k in cfgs, (k, sorted(cfgs))
        assert cfgs[k] > 0, (k, cfgs[k])
    # the scaling training variants either produced a number at SOME batch
    # (fallback ladder) or recorded an honest error key — never silence
    assert any(k.startswith("train_samples_per_sec_per_chip_batch")
               for k in cfgs), sorted(cfgs)
    # headline = the SSIM-compliant fp32 row when measured (the real-chip
    # bench), else the bf16 fallback (this smoke skips fp32)
    assert payload["value"] == cfgs.get("e2e_edits_per_sec_per_chip_fp32",
                                        cfgs["e2e_edits_per_sec_per_chip"])
