"""Golden-value tests for the L0 ops vs the torch reference oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from where2edit_tpu.ops import (
    adaptive_avg_pool,
    fused_leaky_relu,
    gaussian_blur,
    interpolate_bilinear,
    interpolate_nearest,
    make_kernel,
    upfirdn2d,
)
from where2edit_tpu.ops.interpolate import avg_pool, upsample_repeat

from oracle import j2t, ref_upfirdn2d, t2j

RNG = np.random.default_rng(0)


def rand_nchw(*shape):
    return torch.from_numpy(RNG.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize(
    "up,down,pad,ksize",
    [
        (1, 1, (1, 1), 4),     # plain blur
        (2, 1, (2, 1), 4),     # upsample path (model.py:39-44)
        (1, 2, (1, 1), 4),     # downsample path (model.py:60-65)
        (2, 1, (1, 1), 3),     # odd kernel
        (1, 1, (2, 2), 4),
        (1, 2, (2, 1), 4),
    ],
)
def test_upfirdn2d_matches_reference(up, down, pad, ksize):
    mod = ref_upfirdn2d()
    x = rand_nchw(2, 3, 13, 13)
    k1 = np.array([1, 3, 3, 1], dtype=np.float32)[:ksize]
    k = torch.from_numpy(np.outer(k1, k1) / np.outer(k1, k1).sum())
    ref = mod.upfirdn2d(x, k, up=up, down=down, pad=pad)
    got = upfirdn2d(jnp.asarray(t2j(x, nhwc=True)), jnp.asarray(k.numpy()),
                    up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True),
                               rtol=1e-5, atol=1e-5)


def test_upfirdn2d_nonseparable_kernel():
    mod = ref_upfirdn2d()
    x = rand_nchw(1, 2, 9, 9)
    k = torch.from_numpy(RNG.standard_normal((3, 3)).astype(np.float32))
    ref = mod.upfirdn2d(x, k, up=2, down=1, pad=(1, 1))
    got = upfirdn2d(jnp.asarray(t2j(x, nhwc=True)), jnp.asarray(k.numpy()),
                    up=2, down=1, pad=(1, 1))
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True),
                               rtol=1e-5, atol=1e-5)


def test_upfirdn2d_negative_pad():
    mod = ref_upfirdn2d()
    x = rand_nchw(1, 2, 12, 12)
    k1 = np.array([1, 3, 3, 1], dtype=np.float32)
    k = torch.from_numpy(np.outer(k1, k1) / np.outer(k1, k1).sum())
    ref = mod.upfirdn2d(x, k, up=1, down=1, pad=(-1, 2))
    got = upfirdn2d(jnp.asarray(t2j(x, nhwc=True)), jnp.asarray(k.numpy()),
                    pad=(-1, 2))
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True),
                               rtol=1e-5, atol=1e-5)


def test_make_kernel():
    k = make_kernel([1, 3, 3, 1])
    kn = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(k), kn / kn.sum(), rtol=1e-6)


def test_fused_leaky_relu():
    x = rand_nchw(2, 8, 5, 5)
    bias = torch.from_numpy(RNG.standard_normal(8).astype(np.float32))
    ref = (F.leaky_relu(x + bias.view(1, 8, 1, 1), 0.2) * np.sqrt(2)).numpy()
    got = fused_leaky_relu(jnp.asarray(t2j(x, nhwc=True)), jnp.asarray(bias.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("in_size,out_size", [(7, 16), (16, 7), (8, 8), (32, 13), (32, 8), (8, 32)])
def test_interpolate_nearest(in_size, out_size):
    x = rand_nchw(2, 3, in_size, in_size)
    ref = F.interpolate(x, out_size)
    got = interpolate_nearest(jnp.asarray(t2j(x, nhwc=True)), out_size)
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True), atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_size,out_size", [(7, 16), (16, 7), (9, 18)])
def test_interpolate_bilinear(align, in_size, out_size):
    x = rand_nchw(2, 3, in_size, in_size)
    ref = F.interpolate(x, out_size, mode="bilinear", align_corners=align)
    got = interpolate_bilinear(jnp.asarray(t2j(x, nhwc=True)), out_size,
                               align_corners=align)
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(1024, 256), (112, 112), (17, 5), (256, 112)])
def test_adaptive_avg_pool(in_size, out_size):
    x = rand_nchw(1, 2, in_size, in_size)
    ref = torch.nn.AdaptiveAvgPool2d((out_size, out_size))(x)
    got = adaptive_avg_pool(jnp.asarray(t2j(x, nhwc=True)), out_size)
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True),
                               rtol=1e-4, atol=1e-5)


def test_clip_resize_trick():
    """upsample x7 → avgpool(size//32): criteria/clip_loss.py:11-15."""
    x = rand_nchw(1, 3, 64, 64)
    ref = torch.nn.AvgPool2d(64 // 32)(torch.nn.Upsample(scale_factor=7)(x))
    xj = jnp.asarray(t2j(x, nhwc=True))
    got = avg_pool(upsample_repeat(xj, 7), 64 // 32)
    np.testing.assert_allclose(np.asarray(got), t2j(ref, nhwc=True),
                               rtol=1e-4, atol=1e-5)


def test_gaussian_blur():
    """Numpy golden with torchvision's kernel convention (ksize=5 →
    sigma = 0.3·((5-1)·0.5 - 1) + 0.8 = 1.1, reflect padding)."""
    x = RNG.standard_normal((1, 9, 9, 1)).astype(np.float32)
    sigma = 0.3 * ((5 - 1) * 0.5 - 1) + 0.8
    t = np.arange(5) - 2.0
    k1 = np.exp(-(t ** 2) / (2 * sigma ** 2))
    k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    xp = np.pad(x[0, :, :, 0], 2, mode="reflect")
    expect = np.zeros((9, 9), np.float32)
    for i in range(9):
        for j in range(9):
            expect[i, j] = (xp[i:i + 5, j:j + 5] * k2).sum()
    got = gaussian_blur(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(got)[0, :, :, 0], expect,
                               rtol=1e-4, atol=1e-5)


def test_segment_mean_map_matches_loop():
    """Segment pooling == the reference's per-cluster boolean-mask loop
    (attention/run_attention.py:855-873)."""
    from where2edit_tpu.ops.segment import cluster_coverage_penalty, segment_mean_map

    batch, size, clusters = 2, 8, 5
    vals = RNG.random((batch, size, size)).astype(np.float32)
    # cluster 3 of batch 0 intentionally empty
    ids_local = RNG.integers(0, clusters, (batch, size, size))
    ids_local[0][ids_local[0] == 3] = 0
    ids = ids_local + np.arange(batch)[:, None, None] * clusters

    pooled, means, counts = segment_mean_map(
        jnp.asarray(vals), jnp.asarray(ids.astype(np.int32)), batch * clusters
    )

    expect = np.ones_like(vals)
    cov = 0.0
    for i in range(batch * clusters):
        m = ids == i
        if m.sum() == 0:
            continue
        mu = vals[m].mean()
        expect[m] = mu
        cov += max(0.0, mu - 0.7)
    np.testing.assert_allclose(np.asarray(pooled), expect, rtol=1e-5, atol=1e-6)
    pen = cluster_coverage_penalty(means, counts, batch, 0.7)
    np.testing.assert_allclose(float(pen), cov / batch, rtol=1e-5)
