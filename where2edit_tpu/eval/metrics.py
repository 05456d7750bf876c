"""Quantitative eval: FID / IS statistics + the edit-quality harness.

Reference: utils.py:434-551 (torch-fidelity based; call sites commented out
upstream). Here the *statistics* are computed natively (numpy eig-based
matrix sqrt, no scipy/torch-fidelity dependency) over features from any
extractor — the canonical choice is an InceptionV3 checkpoint via the
converter, or CLIP image features ("CLIP-FID") when inception weights are
not available.

Numerics are value-pinned in tests/test_metrics_pinning.py: the matrix sqrt
is cross-checked against scipy.linalg.sqrtm, FID against the closed-form
Gaussian value on constructed exact sample statistics, and IS against exact
hand-computable distributions (uniform → 1, balanced one-hot → C,
two-class → exp(log 2 − H(p))).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets (N, D)."""
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)
    # tr(A + B - 2(A^1/2 B A^1/2)^1/2)
    a_half = _sqrtm_psd(cov_a)
    cross = _sqrtm_psd(a_half @ cov_b @ a_half)
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(cov_a + cov_b - 2 * cross))


def inception_score_from_probs(probs: np.ndarray, splits: int = 10) -> float:
    """IS from class-probability rows (N, C)."""
    scores = []
    n = len(probs)
    for part in np.array_split(probs[: n - n % splits] if n >= splits
                               else probs, min(splits, n)):
        marginal = part.mean(0, keepdims=True)
        kl = part * (np.log(part + 1e-10) - np.log(marginal + 1e-10))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores))


class EditEvaluator:
    """Random-prompt edit sweep collecting ID-cosine, CLIP improvement, and
    generated/original feature pools for FID (utils.py:434-504)."""

    def __init__(self, *, edit_fn: Callable, encode_image: Callable,
                 encode_text: Callable,
                 id_extract: Optional[Callable] = None,
                 fid_extract: Optional[Callable] = None):
        self.edit_fn = edit_fn              # (key, text_feats) -> (orig, gen)
        self.encode_image = encode_image
        self.encode_text = encode_text
        self.id_extract = id_extract
        self.fid_extract = fid_extract or encode_image

    def run(self, key_seq, prompt_token_batches) -> dict:
        import jax

        id_cos, improved, total = 0.0, 0, 0
        feats_gen, feats_orig = [], []
        for key, tokens in zip(key_seq, prompt_token_batches):
            text_feats = self.encode_text(tokens)
            img_orig, img_gen = self.edit_fn(key, text_feats)
            f_orig = self.encode_image(img_orig)
            f_gen = self.encode_image(img_gen)

            def cos(a, b):
                a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
                b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
                return jnp.sum(a * b, axis=-1)

            sim_orig = cos(f_orig, text_feats)
            sim_gen = cos(f_gen, text_feats)
            improved += int(jnp.sum(sim_gen > sim_orig))
            total += int(tokens.shape[0])
            if self.id_extract is not None:
                id_cos += float(jnp.sum(cos(self.id_extract(img_gen),
                                            self.id_extract(img_orig))))
            feats_gen.append(np.asarray(self.fid_extract(img_gen)))
            feats_orig.append(np.asarray(self.fid_extract(img_orig)))

        feats_gen = np.concatenate(feats_gen)
        feats_orig = np.concatenate(feats_orig)
        out = {
            "clip_improvement": improved / max(total, 1),
            "fid_features": frechet_distance(feats_gen, feats_orig),
            "n": total,
        }
        if self.id_extract is not None:
            out["id_cosine"] = id_cos / max(total, 1)
        return out
