"""Direct coverage for modules previously exercised only transitively
(the "files that rot" class): the StyleCLIPMapper composite, IDLoss, the
mapper-training and weight-conversion CLIs, and the profiling/logging utils.
"""

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from where2edit_tpu.models.stylegan2 import Generator

SIZE = 64


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = Generator(size=SIZE)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, 512))])
    return gen, variables


# ---------------------------------------------------------------------------
# editing/styleclip_mapper.py (reference: mapper/styleclip_mapper.py:14-77)
# ---------------------------------------------------------------------------

def test_styleclip_mapper_composite_wplus(gen_and_vars):
    """edit(): w_hat = w + 0.1*mapper(w) then decode (coach.py:83-89)."""
    from where2edit_tpu.editing.styleclip_mapper import (
        StyleCLIPMapper,
        build_mapper,
    )

    gen, gvars = gen_and_vars
    mapper = build_mapper("LevelsMapper", no_fine_mapper=True, bogus_kw=1)
    w = jax.random.normal(jax.random.PRNGKey(2), (2, gen.n_latent, 512))
    mparams = mapper.init({"params": jax.random.PRNGKey(3)}, w)["params"]

    sc = StyleCLIPMapper(mapper=mapper, mapper_params=mparams,
                         generator=gen, generator_vars=gvars)
    image, w_hat = sc.edit(w)
    assert image.shape == (2, SIZE, SIZE, 3)
    delta = mapper.apply({"params": mparams}, w)
    np.testing.assert_allclose(np.asarray(w_hat), np.asarray(w + 0.1 * delta),
                               rtol=1e-5, atol=1e-5)
    # no_fine_mapper zeroes the fine rows' delta → w_hat rows 8+ untouched
    np.testing.assert_allclose(np.asarray(w_hat[:, 8:]), np.asarray(w[:, 8:]),
                               rtol=1e-6, atol=1e-6)
    # the decode matches a direct generator call on w_hat
    direct = gen.apply(gvars, [w + 0.1 * delta], input_is_latent=True,
                       randomize_noise=False)
    np.testing.assert_allclose(np.asarray(image), np.asarray(direct.image),
                               rtol=1e-4, atol=1e-4)
    pooled = sc.face_pool(image)
    assert pooled.shape == (2, 256, 256, 3) or pooled.shape[1] == 256


def test_styleclip_mapper_composite_stylespace(gen_and_vars):
    """work_in_stylespace: per-style residual + S-space decode
    (coach.py:85-87, styleclip_mapper.py:61-71)."""
    from where2edit_tpu.editing.styleclip_mapper import (
        StyleCLIPMapper,
        build_mapper,
    )

    gen, gvars = gen_and_vars
    w = jax.random.normal(jax.random.PRNGKey(4), (2, gen.n_latent, 512))
    styles = gen.apply(gvars, [w], input_is_latent=True, randomize_noise=False,
                       return_features=True).style_vector
    mapper = build_mapper("FullStyleSpaceMapper")
    mparams = mapper.init({"params": jax.random.PRNGKey(5)},
                          list(styles))["params"]
    sc = StyleCLIPMapper(mapper=mapper, mapper_params=mparams,
                         generator=gen, generator_vars=gvars,
                         work_in_stylespace=True)
    image, s_hat = sc.edit(list(styles))
    assert image.shape == (2, SIZE, SIZE, 3)
    delta = mapper.apply({"params": mparams}, list(styles))
    for s, d, sh in zip(styles, delta, s_hat):
        np.testing.assert_allclose(np.asarray(sh), np.asarray(s + 0.1 * d),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# losses/id_loss.py (reference: criteria/id_loss.py:7-40)
# ---------------------------------------------------------------------------

class _FakeFacenet:
    """Deterministic stand-in with the Backbone.apply contract."""

    def apply(self, variables, x):
        feats = jnp.mean(x, axis=(1, 2)) @ variables["proj"]
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def _id_loss():
    from where2edit_tpu.losses.id_loss import IDLoss

    fvars = {"proj": jax.random.normal(jax.random.PRNGKey(0), (3, 16))}
    return IDLoss(_FakeFacenet(), fvars)


def test_id_loss_zero_for_identical_and_crop_box():
    loss_fn = _id_loss()
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 256, 3))
    loss, sim = loss_fn(y, y)
    assert abs(float(loss)) < 1e-5 and sim == 0.0

    # pixels outside the face crop [35:223, 32:220] (id_loss.py:21-23)
    # must not affect the embedding
    y2 = y.at[:, :35, :, :].set(0.0).at[:, :, :32, :].set(1.0)
    f1 = loss_fn.extract_feats(y)
    f2 = loss_fn.extract_feats(y2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-6, atol=1e-6)
    # ... while pixels inside the crop do (channel-asymmetric so the
    # perturbation survives the l2 normalization)
    y3 = y.at[:, 60:180, 60:180, 0].add(0.5)
    f3 = loss_fn.extract_feats(y3)
    assert float(jnp.abs(f3 - f1).max()) > 1e-4
    # non-256 inputs are pooled to 256 first (id_loss.py:21-22)
    f4 = loss_fn.extract_feats(
        jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)))
    assert f4.shape == f1.shape


def test_id_loss_target_is_detached():
    """y goes through stop_gradient (reference detaches y feats,
    id_loss.py:33-38)."""
    loss_fn = _id_loss()
    y = jax.random.uniform(jax.random.PRNGKey(3), (1, 256, 256, 3))
    y_hat = jax.random.uniform(jax.random.PRNGKey(4), (1, 256, 256, 3))
    g_yhat = jax.grad(lambda a: loss_fn(a, y)[0])(y_hat)
    g_y = jax.grad(lambda b: loss_fn(y_hat, b)[0])(y)
    assert float(jnp.abs(g_yhat).max()) > 0.0
    assert float(jnp.abs(g_y).max()) == 0.0


# ---------------------------------------------------------------------------
# cli/mapper_train.py (reference: mapper/scripts/train.py:16-32)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_mapper_train_cli_end_to_end(tmp_path):
    """Tiny LevelsMapper coach run from the CLI: opt.json dump, checkpoint
    journal, refusal of an existing exp_dir (train.py:19-24)."""
    from where2edit_tpu.cli import mapper_train as cli

    exp = tmp_path / "exp"
    args = ["--exp_dir", str(exp), "--description", "purple hair",
            "--stylegan_size", str(SIZE), "--stylegan_weights", "/nonexistent",
            "--clip_lambda", "0", "--id_lambda", "0",
            "--latent_l2_lambda", "0.8", "--max_steps", "2",
            "--batch_size", "2", "--test_batch_size", "2",
            "--train_dataset_size", "4", "--test_dataset_size", "2",
            "--val_interval", "1", "--board_interval", "1",
            "--image_interval", "1"]
    cli.main(args)

    with open(exp / "opt.json") as f:
        opts = json.load(f)
    assert opts["description"] == "purple hair"
    assert (exp / "checkpoints" / "timestamp.txt").exists()

    with pytest.raises(Exception, match="already exists"):
        cli.main(args)


@pytest.mark.slow
def test_mapper_train_cli_checkpoint_warmstart(tmp_path):
    """--checkpoint_path warm-starts the mapper from a previous run's
    checkpoint (mapper/styleclip_mapper.py:38-42): a second run at lr=0
    must end exactly at the loaded weights, not at the fresh init."""
    from where2edit_tpu.cli import mapper_train as cli
    from where2edit_tpu.train.checkpoints import load_checkpoint

    base = ["--description", "purple hair",
            "--stylegan_size", str(SIZE), "--stylegan_weights", "/nonexistent",
            "--clip_lambda", "0", "--id_lambda", "0",
            "--latent_l2_lambda", "0.8", "--max_steps", "1",
            "--batch_size", "2", "--test_batch_size", "1",
            "--train_dataset_size", "4", "--test_dataset_size", "2",
            "--val_interval", "5", "--board_interval", "1",
            "--image_interval", "1"]
    exp1 = tmp_path / "exp1"
    cli.main(base + ["--exp_dir", str(exp1), "--learning_rate", "0.5"])
    src = exp1 / "checkpoints" / "iteration_1"
    assert src.is_dir()
    tree1, _ = load_checkpoint(str(src))

    exp2 = tmp_path / "exp2"
    cli.main(base + ["--exp_dir", str(exp2), "--learning_rate", "0",
                     "--checkpoint_path", str(src)])
    tree2, _ = load_checkpoint(str(exp2 / "checkpoints" / "iteration_1"))
    jax.tree.map(np.testing.assert_array_equal,
                 tree1["mapper"], tree2["mapper"])

    # control: the same lr=0 run WITHOUT --checkpoint_path stays at the
    # fresh init, which must differ from run 1's trained weights — i.e.
    # the equality above is due to the warm start, not a no-op optimizer
    exp3 = tmp_path / "exp3"
    cli.main(base + ["--exp_dir", str(exp3), "--learning_rate", "0"])
    tree3, _ = load_checkpoint(str(exp3 / "checkpoints" / "iteration_1"))
    assert any(not np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(tree1["mapper"]),
                   jax.tree.leaves(tree3["mapper"])))


@pytest.mark.slow
def test_mapper_train_cli_use_mesh(tmp_path):
    """--use_mesh shards the coach batch over all (virtual) devices — the
    reference's multi-GPU DDP analogue reachable from the CLI."""
    from where2edit_tpu.cli import mapper_train as cli

    n = jax.device_count()
    assert n == 8, "conftest must provide the 8-device virtual CPU mesh"
    exp = tmp_path / "exp_mesh"
    cli.main(["--exp_dir", str(exp), "--description", "purple hair",
              "--stylegan_size", str(SIZE),
              "--stylegan_weights", "/nonexistent",
              "--clip_lambda", "0", "--id_lambda", "0",
              "--latent_l2_lambda", "0.8", "--max_steps", "1",
              "--batch_size", str(n), "--test_batch_size", str(n),
              "--train_dataset_size", str(2 * n),
              "--test_dataset_size", str(n),
              "--val_interval", "1", "--board_interval", "1",
              "--image_interval", "1", "--use_mesh"])
    assert (exp / "checkpoints" / "timestamp.txt").exists()


# ---------------------------------------------------------------------------
# cli/convert_weights.py
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_convert_weights_cli_stylegan2(tmp_path, gen_and_vars):
    """Convert a (random) rosinality checkpoint from the CLI and check the
    converted forward matches the torch oracle."""
    import torch

    from oracle import ref_stylegan2, require_reference, t2j
    from test_generator import fixed_noise

    require_reference()
    ref = ref_stylegan2()
    torch.manual_seed(0)
    tgen = ref.Generator(SIZE, 512, 8, channel_multiplier=2)
    src = tmp_path / "g.pt"
    torch.save({"g_ema": tgen.state_dict(),
                "latent_avg": torch.randn(512)}, src)

    from where2edit_tpu.cli import convert_weights as cw

    dst = tmp_path / "native_g"
    cw.main(["stylegan2", str(src), str(dst), "--size", str(SIZE)])

    from where2edit_tpu.train.checkpoints import load_checkpoint

    tree, opts = load_checkpoint(str(dst))
    assert opts["kind"] == "stylegan2"
    assert "latent_avg" in tree

    gen, _ = gen_and_vars
    tn, jn = fixed_noise(tgen)
    w = np.random.default_rng(0).standard_normal(
        (2, tgen.n_latent, 512)).astype(np.float32)
    with torch.no_grad():
        img_ref, _ = tgen([torch.from_numpy(w)], input_is_latent=True,
                          noise=tn)
    params = {k: v for k, v in tree.items() if k != "latent_avg"}
    out = gen.apply(jax.tree.map(jnp.asarray, params), [jnp.asarray(w)],
                    input_is_latent=True, noise=jn)
    np.testing.assert_allclose(np.asarray(out.image), t2j(img_ref, nhwc=True),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# utils/profiling.py, utils/logging.py
# ---------------------------------------------------------------------------

def test_stage_timer_and_sync_fetch():
    from where2edit_tpu.utils.profiling import StageTimer, sync_fetch

    f = jax.jit(lambda x: x * 2.0)
    timer = StageTimer()
    out = timer.time_fn("double", f, jnp.ones((8,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert timer.stages["double"] > 0.0
    # accumulates across calls
    t0 = timer.stages["double"]
    timer.time_fn("double", f, jnp.ones((8,)))
    assert timer.stages["double"] >= t0
    # fences pytrees and 0-d arrays, returns input unchanged
    tree = {"a": jnp.float32(3.0), "b": jnp.ones((2, 2))}
    assert sync_fetch(tree) is tree


def test_trace_and_summarize(tmp_path):
    from where2edit_tpu.utils.profiling import summarize_trace, trace

    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.tanh(x @ x))
    x = jnp.ones((128, 128))
    f(x).block_until_ready()  # compile outside the trace
    with trace(logdir):
        f(x).block_until_ready()
    rows = summarize_trace(logdir)
    assert isinstance(rows, list)
    for name, ms, count in rows:
        assert isinstance(name, str) and ms >= 0.0 and count >= 1


def test_trace_summarize_missing_dir(tmp_path):
    from where2edit_tpu.utils.profiling import summarize_trace

    with pytest.raises(FileNotFoundError):
        summarize_trace(str(tmp_path / "empty"))


def test_logger_tee_and_metrics_writer(tmp_path):
    from where2edit_tpu.utils.logging import Logger, MetricsWriter

    buf = io.StringIO()
    logfile = str(tmp_path / "run.log")
    lg = Logger(buf, logfile)
    lg.write("hello\n")
    lg.flush()
    assert buf.getvalue() == "hello\n"
    with open(logfile) as f:
        assert f.read() == "hello\n"

    mw = MetricsWriter(str(tmp_path / "logs"))
    mw.add_scalar("loss", 1.5, 3)
    mw.add_scalar("loss", np.float32(1.25), 4)
    mw.close()
    with open(os.path.join(tmp_path, "logs", "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert [r["step"] for r in rows] == [3, 4]
    assert rows[0]["tag"] == "loss" and rows[1]["value"] == 1.25
