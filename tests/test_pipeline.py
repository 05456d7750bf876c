"""End-to-end pipeline smoke: CLIs, demo API, eval harness, checkpoints."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SIZE = 64


def test_run_clustering_cli(tmp_path):
    from where2edit_tpu.cli.run_clustering import main

    out = main(["--stylegan_size", str(SIZE), "--ckpt", "/nonexistent",
                "--attention_layer", "7", "--cluster_num", "4",
                "--batch_size", "2", "--step", "2",
                "--results_dir", str(tmp_path)])
    assert os.path.isfile(out)
    assert (tmp_path / "final_cluster.jpg").exists()
    import pickle

    with open(out, "rb") as f:
        centers = pickle.load(f)
    assert centers.shape[0] == 4


def test_run_clustering_cli_dp(tmp_path):
    """--dp N shards the feature-collection batch over a data mesh (the
    reference's DDP phase-1); the gathered matrix and artifacts are the
    same shape as the single-device run."""
    import pickle

    from where2edit_tpu.cli.run_clustering import main

    out = main(["--stylegan_size", str(SIZE), "--ckpt", "/nonexistent",
                "--attention_layer", "7", "--cluster_num", "4",
                "--batch_size", "8", "--step", "1", "--dp", "8",
                "--results_dir", str(tmp_path)])
    assert os.path.isfile(out)
    with open(out, "rb") as f:
        centers = pickle.load(f)
    assert centers.shape[0] == 4


def test_edit_session_and_one_text_edit():
    from where2edit_tpu.demo.api import EditSession
    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLinStyle,
        attention_tables,
    )
    from where2edit_tpu.models.stylegan2 import Generator

    gen = Generator(size=SIZE)
    key = jax.random.PRNGKey(0)
    gvars = gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    tables = attention_tables(SIZE)
    att_layer = 7
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=tables["n_latent"], attention_layer=att_layer,
        cluster_layer=att_layer, clusters=4, cluster_dim=512 + 64,
        generator_size=SIZE, latent_dim=32, in_dim=32 + 512)

    z = jnp.zeros((1, 512))
    out = gen.apply(gvars, [z], randomize_noise=False, return_features=True)
    feats = list(out.feature_map) + [gvars["params"]["input"]["input"]]
    text = jnp.zeros((1, 32))
    mvars = dict(mapper.init({"params": key}, text, out.style_vector, feats,
                             feats[att_layer - 1].shape[1],
                             deterministic_noise=True))
    mvars["clusters"] = {"initial_state":
                         jax.random.normal(key, (4, 512 + 64))}

    session = EditSession(
        generator=gen, gen_vars=gvars, mapper=mapper, mapper_vars=mvars,
        clip_encode_text=lambda toks: jnp.zeros((toks.shape[0], 32)),
        attention_layer=att_layer)
    img0 = session.load_synthetic(jax.random.PRNGKey(3))
    assert img0.shape == (1, SIZE, SIZE, 3)
    img, amap = session.edit(np.zeros((1, 77), np.int32),
                             strength_alpha=0.2)
    assert img.shape == (1, SIZE, SIZE, 3)
    assert amap.shape[0] == 1 and amap.shape[-1] == 1
    assert np.isfinite(np.asarray(img)).all()

    # capture-pruning contract: only the blend-read taps stay full-res in
    # the session (demo/api.blend_tap_indices); the rest are None and the
    # mapper consumes the pre-subsampled copies
    from where2edit_tpu.demo.api import blend_tap_indices, one_text_edit

    from where2edit_tpu.editing.attention_mappers import attention_tables

    blend = 4 * 2 ** (att_layer // 3)
    keep = (set(blend_tap_indices(att_layer))
            | set(attention_tables(SIZE)["layer_num"]))
    for i, f in enumerate(session.feature_map[:-1]):  # [-1] = const tap
        assert (f is not None) == (i in keep), i
        if f is not None:
            assert f.shape[1] <= blend, i  # subsampled at the source
    assert session.feature_map[-1] is not None  # const tap
    assert session.mapper_feature_map is session.feature_map

    # pruned-session edit ≡ one_text_edit over the FULL feature-map list
    # (pre-subsampling is exact: the mapper's attention convs are pointwise)
    wplus = session._sample_w(gvars, jax.random.PRNGKey(3), 0.7,
                              session._mean_latent, 1)
    full = gen.apply(gvars, [wplus], input_is_latent=True,
                     randomize_noise=False, return_features=True)
    feats_full = list(full.feature_map) + [gvars["params"]["input"]["input"]]
    img_ref, _, amap_ref, _ = one_text_edit(
        generator=gen, gen_vars=gvars, mapper=mapper, mapper_vars=mvars,
        text_features=jnp.zeros((1, 32)),
        attention_text_features=jnp.zeros((1, 32)),
        latent=full.style_vector, feature_map=feats_full,
        attention_layer=att_layer, strength_alpha=0.2)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(amap), np.asarray(amap_ref),
                               rtol=1e-5, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from where2edit_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "nested": {"b": np.ones((4,), np.float32)}}
    save_checkpoint(str(tmp_path / "ck"), tree, opts={"x": 1})
    loaded, opts = load_checkpoint(str(tmp_path / "ck"))
    assert opts["x"] == 1
    np.testing.assert_array_equal(np.asarray(loaded["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(loaded["nested"]["b"]),
                                  tree["nested"]["b"])


def test_fid_and_is_statistics():
    from where2edit_tpu.eval.metrics import (
        frechet_distance,
        inception_score_from_probs,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 16)).astype(np.float32)
    b = rng.standard_normal((500, 16)).astype(np.float32) + 0.5
    same = frechet_distance(a, a[:400])
    diff = frechet_distance(a, b)
    assert same < diff
    assert diff > 1.0

    # peaked distributions → higher IS than uniform
    probs_peaked = np.eye(8)[rng.integers(0, 8, 200)] * 0.9 + 0.0125
    probs_flat = np.full((200, 8), 1 / 8)
    assert (inception_score_from_probs(probs_peaked)
            > inception_score_from_probs(probs_flat))


def test_iou_remap_and_jaccard():
    from where2edit_tpu.eval.iou import jaccard, remap_celeba_labels

    label = np.zeros((8, 8), np.int64)
    label[:4, :4] = 1   # region 1
    label[4:, 4:] = 13  # region 8
    planes = remap_celeba_labels(label)
    assert planes.shape == (8, 8, 8)
    assert planes[0, :4, :4].all() and planes[7, 4:, 4:].all()

    pred = planes.reshape(8, -1).T
    per, macro = jaccard(pred, pred)
    assert macro == pytest.approx(2 / 8)  # 2 populated regions, perfect IoU


def test_psp_composite_random_weights():
    from where2edit_tpu.models.encoders import Encoder4Editing
    from where2edit_tpu.models.psp import PSp
    from where2edit_tpu.models.stylegan2 import Generator

    gen = Generator(size=SIZE)
    key = jax.random.PRNGKey(0)
    gvars = gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    enc = Encoder4Editing(stylegan_size=SIZE)
    evars = enc.init(key, jnp.zeros((1, 256, 256, 3)))
    psp = PSp(enc, evars, gen, gvars,
              latent_avg=jnp.zeros((gen.n_latent, 512)))
    x = jax.random.normal(key, (1, 256, 256, 3))
    img, latent, styles = psp(x, return_latents=True)
    assert img.shape == (1, 256, 256, 3)
    assert latent.shape == (1, gen.n_latent, 512)
    assert len(styles) == 2 + 3 * (gen.log_size - 2)


@pytest.mark.slow
def test_edit_prompt_sweep_matches_serial():
    """N prompts over ONE cached face run as a single batch-N dispatch
    (EditSession broadcasts the face's latents/taps to the text batch);
    results must match the N serial single-prompt edits."""
    from where2edit_tpu.demo.api import EditSession
    from where2edit_tpu.editing.attention_mappers import (
        FullSpaceMapperFEATClusterLinStyle,
        attention_tables,
    )
    from where2edit_tpu.models.stylegan2 import Generator

    gen = Generator(size=SIZE)
    key = jax.random.PRNGKey(0)
    gvars = gen.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    tables = attention_tables(SIZE)
    att_layer = 7
    mapper = FullSpaceMapperFEATClusterLinStyle(
        layers=tables["n_latent"], attention_layer=att_layer,
        cluster_layer=att_layer, clusters=4, cluster_dim=512 + 64,
        generator_size=SIZE, latent_dim=32, in_dim=32 + 512)

    z = jnp.zeros((1, 512))
    out = gen.apply(gvars, [z], randomize_noise=False, return_features=True)
    feats = list(out.feature_map) + [gvars["params"]["input"]["input"]]
    mvars = dict(mapper.init({"params": key}, jnp.zeros((1, 32)),
                             out.style_vector, feats,
                             feats[att_layer - 1].shape[1],
                             deterministic_noise=True))
    mvars["clusters"] = {"initial_state":
                         jax.random.normal(key, (4, 512 + 64))}

    # "CLIP": a deterministic per-prompt feature so prompts actually differ
    def fake_encode(toks):
        return jnp.asarray(toks[:, :32], jnp.float32) / 100.0

    session = EditSession(
        generator=gen, gen_vars=gvars, mapper=mapper, mapper_vars=mvars,
        clip_encode_text=fake_encode, attention_layer=att_layer)
    session.load_synthetic(jax.random.PRNGKey(3))

    rng = np.random.default_rng(0)
    prompts = rng.integers(0, 5000, (3, 77)).astype(np.int32)

    img_sweep, amap_sweep = session.edit(prompts, strength_alpha=0.2)
    assert img_sweep.shape == (3, SIZE, SIZE, 3)
    assert amap_sweep.shape[0] == 3

    for i in range(3):
        img_i, amap_i = session.edit(prompts[i: i + 1], strength_alpha=0.2)
        np.testing.assert_allclose(np.asarray(img_sweep[i]),
                                   np.asarray(img_i[0]),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(amap_sweep[i]),
                                   np.asarray(amap_i[0]),
                                   atol=2e-4, rtol=1e-4)
