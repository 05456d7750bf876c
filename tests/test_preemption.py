"""Preemption-safe checkpointing for the long-running CLIs.

The reference has no failure handling (SURVEY.md §5 "failure detection:
none"); a TPU-native production trainer must survive preemption. These tests
deliver a real SIGTERM mid-run at a deterministic step, assert an atomic
snapshot is written, resume from it, and require the resumed run to finish
BIT-EXACT with an uninterrupted run of the same seed.
"""

import os
import signal

import numpy as np
import pytest


def _tree_equal(a, b):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_checkpoint_atomic_replace(tmp_path):
    """Overwriting save stages into a temp dir and renames; no .tmp/.old
    residue and the destination is always a complete checkpoint."""
    from where2edit_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    path = str(tmp_path / "ck")
    save_checkpoint(path, {"a": np.ones((2,), np.float32)}, opts={"v": 1})
    save_checkpoint(path, {"a": np.zeros((2,), np.float32)}, opts={"v": 2})
    tree, opts = load_checkpoint(path)
    assert opts["v"] == 2
    np.testing.assert_array_equal(np.asarray(tree["a"]), np.zeros((2,)))
    residue = [d for d in os.listdir(tmp_path)
               if ".tmp-" in d or ".old-" in d]
    assert residue == []


def test_save_checkpoint_crash_window_recovery(tmp_path):
    """A writer killed between save_checkpoint's two renames leaves the
    prior complete checkpoint stranded at {path}.old-*; load_checkpoint
    restores it. Stale .tmp-* residue from any pid is swept on next save."""
    import shutil

    from where2edit_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    path = str(tmp_path / "ck")
    save_checkpoint(path, {"a": np.ones((2,), np.float32)}, opts={"v": 1})
    # simulate the crash window: path was renamed to .old-<otherpid>, the
    # new tmp never landed
    os.rename(path, f"{path}.old-99999")
    with open(str(tmp_path / "ck.tmp-99999"), "w") as f:
        f.write("half-written residue")
    tree, opts = load_checkpoint(path)
    assert opts["v"] == 1
    np.testing.assert_array_equal(np.asarray(tree["a"]), np.ones((2,)))
    # a subsequent save sweeps all residue (different-pid tmp included)
    shutil.rmtree(f"{path}.old-99999", ignore_errors=True)
    save_checkpoint(path, {"a": np.zeros((2,), np.float32)}, opts={"v": 2})
    residue = [d for d in os.listdir(tmp_path)
               if ".tmp-" in d or ".old-" in d]
    assert residue == []
    _, opts = load_checkpoint(path)
    assert opts["v"] == 2


def test_gan_cli_sigterm_resume_bit_exact(tmp_path, monkeypatch):
    """kill -TERM mid-GAN-training → checkpoint at the step boundary →
    --resume finishes identical to an uninterrupted run."""
    from where2edit_tpu.cli.train_stylegan import main
    from where2edit_tpu.train.checkpoints import load_checkpoint
    from where2edit_tpu.train.gan_trainer import GANTrainer

    common = ["--synthetic", "8", "--size", "16", "--channel_multiplier",
              "1", "--batch", "2", "--iter", "4", "--d_reg_every", "2",
              "--g_reg_every", "2", "--sample_every", "0", "--save_every",
              "0", "--seed", "0"]

    # uninterrupted run
    full_dir = main(common + ["--results_dir", str(tmp_path / "full")])
    full_tree, _ = load_checkpoint(full_dir)

    # interrupted run: real SIGTERM delivered while step 2 executes
    orig_step = GANTrainer.step

    def step_with_sigterm(self, real, key=None):
        if self.global_step == 2:
            signal.raise_signal(signal.SIGTERM)
        return orig_step(self, real, key)

    monkeypatch.setattr(GANTrainer, "step", step_with_sigterm)
    out = main(common + ["--results_dir", str(tmp_path / "pre")])
    monkeypatch.setattr(GANTrainer, "step", orig_step)
    assert out is None  # preempted, not finished

    ckpts = sorted(d for d in os.listdir(tmp_path / "pre")
                   if d.startswith("ckpt_"))
    assert ckpts, "SIGTERM must leave a checkpoint"
    pre_tree, _ = load_checkpoint(str(tmp_path / "pre" / ckpts[-1]))
    stopped_at = int(pre_tree["step"])
    assert 0 < stopped_at < 4

    # resume → must match the uninterrupted run exactly
    resumed_dir = main(common + [
        "--results_dir", str(tmp_path / "res"),
        "--resume", str(tmp_path / "pre" / ckpts[-1])])
    res_tree, _ = load_checkpoint(resumed_dir)
    for k in ("g", "d", "g_ema", "pl_mean"):
        _tree_equal(full_tree[k], res_tree[k])


def test_attention_cli_sigterm_resume_bit_exact(tmp_path, monkeypatch):
    """Same contract for the region-attention trainer: SIGTERM →
    preempt_mapper snapshot (params + opt state + step) → --resume finishes
    bit-exact."""
    from where2edit_tpu.cli import run_attention as cli
    from where2edit_tpu.train.attention_trainer import AttentionTrainer
    from where2edit_tpu.train.checkpoints import load_checkpoint

    def args(results, extra=()):
        return ["--stylegan_size", "32", "--attention_layer", "4",
                "--cluster_layer", "4", "--batch_size", "2", "--step", "4",
                "--save_intermediate_image_every", "0",
                "--work_in_stylespace", "--results_dir", str(results),
                "--ckpt", "/nonexistent", "--seed", "1", *extra]

    full_dir = cli.main(args(tmp_path / "full"))
    full_tree, _ = load_checkpoint(os.path.join(full_dir, "final_mapper"))
    assert int(full_tree["step"]) == 4

    orig_run = AttentionTrainer.run

    def run_with_sigterm(self, *a, **kw):
        inner = kw.get("stop_fn")

        def stop():
            if self.steps_completed >= 2:
                signal.raise_signal(signal.SIGTERM)
            return bool(inner()) if inner is not None else False

        kw["stop_fn"] = stop
        return orig_run(self, *a, **kw)

    monkeypatch.setattr(AttentionTrainer, "run", run_with_sigterm)
    pre_dir = cli.main(args(tmp_path / "pre"))
    monkeypatch.setattr(AttentionTrainer, "run", orig_run)

    snap = os.path.join(pre_dir, "preempt_mapper")
    assert os.path.isdir(snap), "SIGTERM must leave a preempt snapshot"
    pre_tree, _ = load_checkpoint(snap)
    assert int(pre_tree["step"]) == 2
    assert "opt_state" in pre_tree

    res_dir = cli.main(args(tmp_path / "res", extra=("--resume", snap)))
    res_tree, _ = load_checkpoint(os.path.join(res_dir, "final_mapper"))
    assert int(res_tree["step"]) == 4
    _tree_equal(full_tree["mapper"], res_tree["mapper"])


def test_mapper_train_cli_sigterm_resume(tmp_path, monkeypatch):
    """Third long-running CLI (StyleCLIP coach): SIGTERM → atomic
    'preempt' snapshot with optimizer state + step; --resume continues at
    the recorded step and completes max_steps."""
    from where2edit_tpu.cli import mapper_train as cli
    from where2edit_tpu.train.checkpoints import load_checkpoint
    from where2edit_tpu.train.coach import Coach

    base = ["--description", "purple hair", "--stylegan_size", "32",
            "--stylegan_weights", "/nonexistent",
            "--clip_lambda", "0", "--id_lambda", "0",
            "--latent_l2_lambda", "0.8", "--max_steps", "4",
            "--batch_size", "2", "--test_batch_size", "1",
            "--train_dataset_size", "4", "--test_dataset_size", "2",
            "--val_interval", "9", "--board_interval", "1",
            "--image_interval", "1"]

    orig_train = Coach.train

    def train_with_sigterm(self, stop_fn=None):
        def stop():
            if self.global_step >= 2:
                signal.raise_signal(signal.SIGTERM)
            return bool(stop_fn()) if stop_fn is not None else False

        return orig_train(self, stop_fn=stop)

    monkeypatch.setattr(Coach, "train", train_with_sigterm)
    exp1 = tmp_path / "exp1"
    cli.main(base + ["--exp_dir", str(exp1)])
    monkeypatch.setattr(Coach, "train", orig_train)

    snap = exp1 / "checkpoints" / "preempt"
    assert snap.is_dir(), "SIGTERM must leave a preempt snapshot"
    tree, _ = load_checkpoint(str(snap))
    assert int(tree["step"]) == 2 and "opt_state" in tree

    exp2 = tmp_path / "exp2"
    cli.main(base + ["--exp_dir", str(exp2), "--resume", str(snap)])
    final, _ = load_checkpoint(str(exp2 / "checkpoints" / "iteration_4"))
    assert int(final["step"]) == 4
    # training continued past the snapshot: weights moved
    import jax

    assert any(not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in
               zip(jax.tree.leaves(tree["mapper"]),
                   jax.tree.leaves(final["mapper"])))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
