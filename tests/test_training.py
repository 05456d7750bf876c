"""Training-loop smoke + multi-device semantics on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from where2edit_tpu.editing.attention_mappers import (
    FullSpaceMapperFEATClusterLinStyle,
    attention_tables,
)
from where2edit_tpu.editing.latent_mappers import LevelsMapper
from where2edit_tpu.models.stylegan2 import Generator
from where2edit_tpu.train.attention_trainer import (
    AttentionTrainConfig,
    AttentionTrainer,
)
from where2edit_tpu.train.coach import Coach, CoachConfig

SIZE = 32


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = Generator(size=SIZE)
    key = jax.random.PRNGKey(0)
    variables = gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    return gen, variables


def test_coach_smoke(tmp_path, gen_and_vars):
    """Two Coach steps at 64px with the l2 loss only (no CLIP/ID weights)."""
    gen, gvars = gen_and_vars
    mean_latent = jnp.zeros((1, 512))
    cfg = CoachConfig(exp_dir=str(tmp_path), max_steps=2, batch_size=2,
                      test_batch_size=2, train_dataset_size=8,
                      test_dataset_size=4, id_lambda=0.0, clip_lambda=0.0,
                      latent_l2_lambda=0.8, val_interval=1, board_interval=1,
                      stylegan_size=SIZE, optim_name="ranger",
                      learning_rate=0.5)
    coach = Coach(cfg, generator=gen, generator_variables=gvars,
                  mapper=LevelsMapper(), latent_avg=mean_latent)
    p0 = jax.tree.leaves(coach.mapper_params)[0].copy()
    coach.train()
    p1 = jax.tree.leaves(coach.mapper_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert (tmp_path / "checkpoints" / "timestamp.txt").exists()


class FakeCLIP:
    """Tiny deterministic image embedder for trainer smoke tests."""

    def __init__(self, key, dim=64):
        self.proj = jax.random.normal(key, (3, dim)) / 8

    def __call__(self, img):
        pooled = jnp.mean(img, axis=(1, 2))
        return pooled @ self.proj


def _build_trainer(gen, gvars, batch, steps=2, mesh=None, lr=0.05,
                   remat=False):
    tables = attention_tables(SIZE)
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=tables["n_latent"], attention_layer=4, cluster_layer=4,
        clusters=4, cluster_dim=512 + 64, generator_size=SIZE,
        latent_dim=64, in_dim=64 + 512)
    key = jax.random.PRNGKey(1)
    enc = FakeCLIP(key)

    # init mapper with representative inputs
    z = jax.random.normal(key, (batch, 512))
    out = gen.apply(gvars, [z], randomize_noise=False, return_features=True)
    feats = list(out.feature_map)
    const = gvars["params"]["input"]["input"]
    feats.append(jnp.broadcast_to(const, (batch, *const.shape[1:])))
    blend_size = feats[3].shape[1]
    text = jnp.zeros((batch, 64))
    mvars = mapper.init({"params": key}, text, out.style_vector, feats,
                        blend_size, deterministic_noise=True)
    centers = jax.random.normal(key, (4, 512 + 64))
    mvars = dict(mvars)
    mvars["clusters"] = {"initial_state": centers}

    cfg = AttentionTrainConfig(stylegan_size=SIZE, attention_layer=4,
                               cluster_layer=4, batch_size=batch, step=steps,
                               work_in_stylespace=True, lr=lr, remat=remat)
    trainer = AttentionTrainer(
        cfg, generator=gen, gen_vars=gvars, mapper=mapper,
        mapper_params=mvars["params"],
        encode_image=lambda lv, img: enc(img),
        perceptual=lambda lv, a, b: jnp.mean(jnp.square(a - b)),
        mean_latent=jnp.zeros((1, 512)),
        mapper_extra_variables={"clusters": mvars["clusters"]}, mesh=mesh)
    return trainer, text


def test_attention_trainer_smoke(gen_and_vars):
    gen, gvars = gen_and_vars
    trainer, text = _build_trainer(gen, gvars, batch=2)
    hist = trainer.run(text, log_every=1)
    assert len(hist) == 2
    for _, scal in hist:
        assert np.isfinite(scal["loss"])


def test_remat_step_matches_nonremat(gen_and_vars):
    """cfg.remat recomputes the grad-pass synthesis in the backward —
    identical numerics, just a different activation-memory schedule."""
    gen, gvars = gen_and_vars
    t_plain, text = _build_trainer(gen, gvars, batch=2, steps=2)
    t_remat, _ = _build_trainer(gen, gvars, batch=2, steps=2, remat=True)
    key = jax.random.PRNGKey(5)
    p1, _, aux1, img1, _ = t_plain.step_fn(
        t_plain.mapper_params, t_plain.opt_state, jnp.asarray(0.0), key, text)
    p2, _, aux2, img2, _ = t_remat.step_fn(
        t_remat.mapper_params, t_remat.opt_state, jnp.asarray(0.0), key, text)
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_attention_prompt_resampled_per_step(gen_and_vars):
    """Each step draws a fresh region prompt from the bank inside the jitted
    step (the reference re-samples + re-encodes per step,
    run_attention.py:1134-1144); a trained run must see every prompt."""
    gen, gvars = gen_and_vars
    trainer, text = _build_trainer(gen, gvars, batch=2, steps=8)
    bank = jnp.tile(text[:1], (7, 1)) + 0.01 * jnp.arange(7.0)[:, None]
    hist = trainer.run(bank, log_every=1)
    idxs = {scal["att_idx"] for _, scal in hist}
    assert len(idxs) >= 2, f"prompt never varied: {idxs}"


def test_attention_trainer_frozen_attention(gen_and_vars):
    """Reference quirk: attention params get zero grads while t < 1.15."""
    gen, gvars = gen_and_vars
    trainer, text = _build_trainer(gen, gvars, batch=2, steps=4)
    before = {k: np.asarray(v).copy()
              for k, v in trainer.mapper_params.items()
              if k.startswith("attention") or k.startswith("initial")}
    trainer.run(text, log_every=4)
    for k, v0 in before.items():
        v1 = np.asarray(trainer.mapper_params[k]) \
            if not isinstance(trainer.mapper_params[k], dict) else None
        if v1 is not None:
            np.testing.assert_array_equal(v0, v1, err_msg=k)


def test_dp_sharded_step_runs_on_8_devices(gen_and_vars):
    """Global-batch step with batch sharded over the 8-device mesh —
    validates the DDP-equivalent semantics without hardware."""
    from where2edit_tpu.parallel.mesh import make_mesh

    gen, gvars = gen_and_vars
    assert jax.device_count() == 8
    mesh = make_mesh()
    trainer, text = _build_trainer(gen, gvars, batch=8, mesh=mesh)
    hist = trainer.run(jnp.tile(text[:1], (7, 1)), log_every=1)
    assert np.isfinite(hist[-1][1]["loss"])


def test_dp_step_equals_single_device_global_batch(gen_and_vars):
    """The DDP-equivalence claim (attention_trainer.py docstring), proved
    numerically: k steps of the batch-sharded 8-device step produce the SAME
    mapper params as k steps of the unsharded global-batch step."""
    from where2edit_tpu.parallel.mesh import make_mesh

    gen, gvars = gen_and_vars
    mesh = make_mesh()
    # tiny lr: Adam's update is ±lr·ĝ/√v̂, and for elements whose gradient
    # is at reduction-noise level the SIGN can flip between shardings — an
    # irreducible ±2·steps·lr param ambiguity that says nothing about
    # semantic equivalence. With lr=1e-4 that ambiguity is ≤4e-4 while any
    # real divergence (wrong collective/averaging) shows at O(1).
    lr = 1e-4
    t_dp, text = _build_trainer(gen, gvars, batch=8, steps=2, mesh=mesh,
                                lr=lr)
    t_one, _ = _build_trainer(gen, gvars, batch=8, steps=2, lr=lr)
    bank = jnp.tile(text[:1], (7, 1)) + 0.01 * jnp.arange(7.0)[:, None]
    t_dp.run(bank, log_every=1)
    t_one.run(bank, log_every=1)
    flat_dp = jax.tree.leaves(t_dp.mapper_params)
    flat_one = jax.tree.leaves(t_one.mapper_params)
    for a, b in zip(flat_dp, flat_one):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0, atol=5 * lr)
        assert np.mean(np.abs(a - b)) < lr


def test_infonce_allgather_matches_global():
    """shard_map all-gather InfoNCE == single-device global InfoNCE."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from where2edit_tpu.losses.infonce import infonce_consistency
    from where2edit_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    expect = float(infonce_consistency(img, cond))

    mesh = make_mesh()
    f = shard_map(
        partial(infonce_consistency, axis_name="data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        check_vma=False)
    got = float(f(img, cond))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_broadcast_from_first_semantics():
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from where2edit_tpu.parallel.collectives import broadcast_from_first
    from where2edit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    x = jnp.arange(8.0).reshape(8, 1)
    f = shard_map(partial(broadcast_from_first, axis_name="data"),
                  mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    out = np.asarray(f(x))
    np.testing.assert_array_equal(out, np.zeros((8, 1)))


def test_bf16_train_step_tracks_fp32(gen_and_vars):
    """Train-time bf16 (the reference's opt-in --amp analogue,
    run_attention.py:1068-1069): the bf16-synthesis training step follows the
    fp32 loss curve. Params/losses/demod stay fp32 either way."""
    gen_fp32, gvars = gen_and_vars
    gen_bf16 = Generator(size=SIZE, dtype=jnp.bfloat16)
    t32, text = _build_trainer(gen_fp32, gvars, batch=2, steps=3)
    t16, _ = _build_trainer(gen_bf16, gvars, batch=2, steps=3)
    bank = jnp.tile(text[:1], (7, 1))
    h32 = t32.run(bank, log_every=1)
    h16 = t16.run(bank, log_every=1)
    assert len(h16) == len(h32) == 3
    for (_, s32), (_, s16) in zip(h32, h16):
        assert np.isfinite(s16["loss"])
        assert abs(s16["loss"] - s32["loss"]) <= 0.1 * abs(s32["loss"]) + 0.1, (
            f"bf16 loss {s16['loss']} drifted from fp32 {s32['loss']}")


def test_nan_guard_rolls_back_and_aborts(gen_and_vars):
    """Failure detection: non-finite losses roll back, then abort."""
    gen, gvars = gen_and_vars
    trainer, text = _build_trainer(gen, gvars, batch=2, steps=5)

    calls = {"n": 0}
    orig = trainer.step_fn

    def poisoned(params, opt_state, step_idx, key, att):
        p, o, aux, img, amap = orig(params, opt_state, step_idx, key, att)
        calls["n"] += 1
        aux = dict(aux)
        aux["loss"] = jnp.asarray(float("nan"))
        return p, o, aux, img, amap

    trainer.step_fn = poisoned
    with pytest.raises(FloatingPointError):
        trainer.run(text, log_every=1)
    assert calls["n"] == 3  # three consecutive rejections then abort


def test_nan_guard_checks_only_at_log_points(gen_and_vars):
    """The guard syncs only every log_every steps (r5 de-sync): between
    checks the host dispatches ahead with no device round-trip; a NaN is
    caught at the next log point after rolling back up to log_every steps."""
    gen, gvars = gen_and_vars
    trainer, text = _build_trainer(gen, gvars, batch=2, steps=5)

    calls = {"n": 0}
    orig = trainer.step_fn

    def poisoned(params, opt_state, step_idx, key, att):
        p, o, aux, img, amap = orig(params, opt_state, step_idx, key, att)
        calls["n"] += 1
        aux = dict(aux)
        aux["loss"] = jnp.asarray(float("nan"))
        return p, o, aux, img, amap

    trainer.step_fn = poisoned
    with pytest.raises(FloatingPointError):
        trainer.run(text, log_every=2)
    # checks fire at steps 0, 2 and the final step 4 — three bad checks,
    # five dispatched steps (1 and 3 ran unchecked)
    assert calls["n"] == 5
