"""Parity for the misc utils: cutouts/lanczos, clamp grad, boxes, SSIM,
bf16 policy, datasets, registry."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from oracle import require_reference, t2j

RNG = np.random.default_rng(51)


def _ref_utils():
    require_reference()
    from oracle import _stub_heavy_modules
    import sys

    _stub_heavy_modules()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import utils as ref_utils  # noqa: PLC0415
    return ref_utils


def test_lanczos_resample_close_to_reference():
    ref = _ref_utils()
    x = torch.from_numpy(RNG.random((1, 3, 64, 64)).astype(np.float32))
    out_ref = ref.resample(x, (16, 16))
    from where2edit_tpu.utils.cutouts import resample

    got = resample(jnp.asarray(t2j(x, nhwc=True)), (16, 16))
    # final interpolation differs (bilinear vs bicubic) — the lanczos
    # prefilter dominates; expect close but not bit-equal.
    np.testing.assert_allclose(np.asarray(got), t2j(out_ref, nhwc=True),
                               atol=0.06)


def test_clamp_with_grad_matches_reference():
    ref = _ref_utils()
    x_t = torch.tensor([-2.0, -0.5, 0.5, 2.0], requires_grad=True)
    y_t = ref.ClampWithGrad.apply(x_t, 0.0, 1.0)
    g = torch.tensor([1.0, -1.0, 1.0, -1.0])
    y_t.backward(g)

    from where2edit_tpu.utils.cutouts import clamp_with_grad

    x = jnp.asarray([-2.0, -0.5, 0.5, 2.0])
    y, vjp = jax.vjp(lambda v: clamp_with_grad(v, 0.0, 1.0), x)
    (gx,) = vjp(jnp.asarray([1.0, -1.0, 1.0, -1.0]))
    np.testing.assert_allclose(np.asarray(y), y_t.detach().numpy())
    np.testing.assert_allclose(np.asarray(gx), x_t.grad.numpy())


def test_masks_to_boxes_matches_reference():
    ref = _ref_utils()
    masks = np.zeros((3, 1, 32, 32), np.float32)
    masks[0, 0, 8:16, 4:12] = 1.0      # interior blob
    masks[1, 0, 0:4, 28:32] = 1.0      # corner blob
    # mask 2 empty → full-frame fallback
    ref_boxes = ref.masks_to_boxes(torch.from_numpy(masks)).numpy()

    from where2edit_tpu.utils.cutouts import masks_to_boxes

    got = np.asarray(masks_to_boxes(jnp.asarray(masks[:, 0])))
    np.testing.assert_array_equal(got, ref_boxes)


def test_ssim_basics():
    from where2edit_tpu.eval.ssim import ssim

    x = jnp.asarray(RNG.random((1, 32, 32, 3)).astype(np.float32)) * 2 - 1
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    noisy = x + 0.5 * jnp.asarray(RNG.standard_normal(x.shape).astype(np.float32))
    assert float(ssim(x, noisy)) < 0.6


def test_bf16_policy_ssim():
    from where2edit_tpu.eval.ssim import ssim
    from where2edit_tpu.models.stylegan2 import Generator

    key = jax.random.PRNGKey(0)
    g32 = Generator(size=64)
    g16 = Generator(size=64, dtype=jnp.bfloat16)
    v = g32.init({"params": key, "noise": key}, [jnp.zeros((1, 512))])
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 512))
    i32 = g32.apply(v, [z], randomize_noise=False).image
    i16 = g16.apply(v, [z], randomize_noise=False).image
    assert i16.dtype == jnp.float32  # RGB chain stays fp32
    assert float(ssim(i32, i16)) > 0.99


def test_stylespace_dataset_roundtrip():
    from where2edit_tpu.editing.latent_mappers import STYLESPACE_DIMENSIONS
    from where2edit_tpu.train.datasets import (
        StyleSpaceLatentsDataset,
        convert_s_tensor_to_list,
    )

    styles = [RNG.standard_normal((4, 1, d)).astype(np.float32)
              for d in STYLESPACE_DIMENSIONS]
    ds = StyleSpaceLatentsDataset(styles)
    assert ds.latents.shape == (4, 1, 512 * len(STYLESPACE_DIMENSIONS))
    back = convert_s_tensor_to_list(ds.latents)
    for orig, rec in zip(styles, back):
        np.testing.assert_array_equal(orig, rec)


def test_registry():
    from where2edit_tpu.utils.registry import (
        GOOGLE_DRIVE_PATHS,
        ensure_checkpoint_exists,
    )

    assert len(GOOGLE_DRIVE_PATHS) == 16
    assert not ensure_checkpoint_exists("definitely_missing.pt")


def test_make_cutouts_shapes_and_range():
    from where2edit_tpu.utils.cutouts import MakeCutouts

    mc = MakeCutouts(cut_size=16, cutn=3)
    x = jnp.asarray(RNG.random((2, 32, 32, 3)).astype(np.float32))
    out = jax.jit(mc)(jax.random.PRNGKey(0), x)  # static shapes under jit
    assert out.shape == (6, 16, 16, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_crop_resize_bilinear_identity_and_variable_sizes():
    """Variable-size crops (utils.py:300-305): identity when size == out
    at integer offsets; different traced sizes give different crops."""
    from where2edit_tpu.utils.cutouts import crop_resize_bilinear

    x = jnp.asarray(RNG.random((1, 32, 32, 3)).astype(np.float32))
    out = crop_resize_bilinear(x, jnp.float32(4), jnp.float32(6),
                               jnp.float32(16), 16)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x[:, 4:20, 6:22]), atol=1e-6)
    # a 2x-size crop at the same origin is a genuine downscale, not a slice
    out2 = crop_resize_bilinear(x, jnp.float32(0), jnp.float32(0),
                                jnp.float32(32), 16)
    out3 = crop_resize_bilinear(x, jnp.float32(0), jnp.float32(0),
                                jnp.float32(16), 16)
    assert not np.allclose(np.asarray(out2), np.asarray(out3))


def test_enable_compile_cache_knobs(tmp_path, monkeypatch):
    """utils/cache.py: entry points opt into the persistent compile cache;
    W2E_COMPILE_CACHE=0 disables, W2E_JAX_CACHE overrides the directory."""
    import jax

    from where2edit_tpu.utils.cache import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("W2E_COMPILE_CACHE", "0")
        assert enable_compile_cache() is None
        assert jax.config.jax_compilation_cache_dir == prev

        monkeypatch.delenv("W2E_COMPILE_CACHE")
        monkeypatch.setenv("W2E_JAX_CACHE", str(tmp_path / "cache"))
        got = enable_compile_cache()
        assert got == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == got
        # explicit path wins over the env var
        assert enable_compile_cache(str(tmp_path / "x")) == str(tmp_path / "x")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
