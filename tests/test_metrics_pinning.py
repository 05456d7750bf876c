"""Value-pinning for the native FID/IS statistics (eval/metrics.py).

The reference computes IS/FID through torch-fidelity
(/root/reference/utils.py:537-548); our native replacement must be pinned to
closed-form values and cross-checked against an independent matrix-sqrt
implementation (scipy.linalg.sqrtm) — property tests alone (ordering,
monotonicity in tests/test_pipeline.py) would not catch a subtly wrong
sqrt, and since the GAN trainer consumes FID during training (--fid_every)
such a bug would silently corrupt every training curve.

torch-fidelity itself is not installed in this image (zero egress); scipy
is the independent oracle here.
"""

import numpy as np
import pytest
import scipy.linalg

from where2edit_tpu.eval.metrics import (
    _sqrtm_psd,
    frechet_distance,
    inception_score_from_probs,
)


def _random_psd(rng, d, scale=1.0):
    a = rng.standard_normal((d, d))
    return scale * (a @ a.T) / d + 1e-3 * np.eye(d)


def test_sqrtm_psd_matches_scipy():
    rng = np.random.default_rng(0)
    for d in (2, 8, 64):
        for scale in (1e-3, 1.0, 1e3):
            mat = _random_psd(rng, d, scale)
            ours = _sqrtm_psd(mat)
            ref = scipy.linalg.sqrtm(mat).real
            np.testing.assert_allclose(ours, ref, rtol=1e-6,
                                       atol=1e-8 * scale)
            # it IS a square root
            np.testing.assert_allclose(ours @ ours, mat, rtol=1e-6,
                                       atol=1e-8 * scale)


def _whiten(x):
    """Transform x so its sample mean is exactly 0 and np.cov (ddof=1) is
    exactly the identity — enables exact closed-form FID constructions."""
    x = x - x.mean(0)
    cov = np.cov(x, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    inv_half = (vecs / np.sqrt(vals)) @ vecs.T
    return x @ inv_half


def test_fid_closed_form_gaussian():
    """Features constructed with exact sample statistics (μ_i, s_i²·I):
    FID must equal |μ₁−μ₂|² + D·(s₁−s₂)² analytically."""
    rng = np.random.default_rng(1)
    d = 16
    xa = _whiten(rng.standard_normal((400, d)))
    xb = _whiten(rng.standard_normal((300, d)))
    mu_a = rng.standard_normal(d)
    mu_b = rng.standard_normal(d)
    s_a, s_b = 1.7, 0.6
    fid = frechet_distance(mu_a + s_a * xa, mu_b + s_b * xb)
    expected = float((mu_a - mu_b) @ (mu_a - mu_b) + d * (s_a - s_b) ** 2)
    assert fid == pytest.approx(expected, rel=1e-6)


def test_fid_zero_on_identical_statistics():
    rng = np.random.default_rng(2)
    x = _whiten(rng.standard_normal((200, 8)))
    # different samples, identical sample statistics → FID exactly 0
    y = _whiten(rng.standard_normal((500, 8)))
    assert frechet_distance(x, y) == pytest.approx(0.0, abs=1e-8)


def test_fid_cross_check_scipy_full_covariance():
    """End-to-end cross-check on generic (non-diagonal) covariances: the
    native frechet_distance must match the textbook formula evaluated with
    scipy's sqrtm on the same sample statistics."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((300, 12)) @ rng.standard_normal((12, 12))
    b = rng.standard_normal((250, 12)) @ rng.standard_normal((12, 12)) + 0.3
    mu_a, mu_b = a.mean(0), b.mean(0)
    cov_a = np.cov(a, rowvar=False)
    cov_b = np.cov(b, rowvar=False)
    cross = scipy.linalg.sqrtm(cov_a @ cov_b).real
    expected = float((mu_a - mu_b) @ (mu_a - mu_b)
                     + np.trace(cov_a + cov_b - 2 * cross))
    assert frechet_distance(a, b) == pytest.approx(expected, rel=1e-6)


def test_inception_score_uniform_is_one():
    probs = np.full((200, 10), 0.1)
    assert inception_score_from_probs(probs) == pytest.approx(1.0, abs=1e-9)


def test_inception_score_exact_on_balanced_onehot():
    """One-hot predictions, each split containing every class equally:
    KL(p‖marginal) = log C per row, so IS = C exactly."""
    c, splits = 8, 10
    probs = np.concatenate([np.eye(c)] * splits)  # 80 rows, balanced splits
    assert inception_score_from_probs(probs, splits=splits) == pytest.approx(
        float(c), rel=1e-6)


def test_inception_score_two_class_closed_form():
    """Half the rows (p, 1−p), half (1−p, p) in every split: marginal is
    (½, ½), so IS = exp(log 2 − H(p)) analytically."""
    p = 0.9
    row_a = np.array([p, 1 - p])
    rows = np.stack([row_a, row_a[::-1]] * 50)
    h = -(p * np.log(p) + (1 - p) * np.log(1 - p))
    expected = float(np.exp(np.log(2.0) - h))
    assert inception_score_from_probs(rows, splits=10) == pytest.approx(
        expected, rel=1e-5)
