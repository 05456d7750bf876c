"""Native C++ runtime (k-means) parity with the Python backends."""

import numpy as np
import pytest

from where2edit_tpu.utils.native import (
    kmeans_assign_native,
    kmeans_fit_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable (no g++)")


def test_native_kmeans_partitions_correctly():
    rng = np.random.default_rng(1)
    data = np.concatenate(
        [rng.normal(i * 6, 0.5, (500, 16)) for i in range(4)]).astype(np.float32)
    centers, iters = kmeans_fit_native(data, 4, seed=7)
    assert iters >= 1
    ids = kmeans_assign_native(data, centers)
    for i in range(4):
        seg = ids[i * 500:(i + 1) * 500]
        assert (seg == seg[0]).all()
    # recovered means within noise of the true means
    for i in range(4):
        c = centers[ids[i * 500]]
        np.testing.assert_allclose(c, np.full(16, i * 6), atol=0.2)


def test_native_backend_through_kmeans_fit():
    from where2edit_tpu.editing.clustering import kmeans_fit

    rng = np.random.default_rng(2)
    data = rng.standard_normal((2000, 36)).astype(np.float32)
    centers = kmeans_fit(data, 5, backend="native")
    assert centers.shape == (5, 36)
    assert np.isfinite(centers).all()


def test_native_assign_matches_numpy():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((300, 8)).astype(np.float32)
    centers = rng.standard_normal((6, 8)).astype(np.float32)
    ids = kmeans_assign_native(data, centers)
    expect = np.argmin(
        ((data[:, None, :] - centers[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(ids, expect)


def test_native_bpe_matches_python():
    """C++ BPE == Python SimpleTokenizer on a synthetic merges vocab."""
    import os
    import tempfile

    from where2edit_tpu.models.clip_tokenizer import SimpleTokenizer
    from where2edit_tpu.utils.native import NativeBPE

    # synthetic merges covering common english bigrams (incl. </w> merges)
    merges = [
        "h e", "he l", "hel l", "hell o</w>", "a i", "ai r</w>",
        "t h", "th e</w>", "w i", "wi t", "wit h</w>", "o n</w>",
        "g r", "gr e", "gre y</w>", "h a", "ha i", "hai r</w>",
        "e y", "ey e", "eye s</w>", "n a", "na r", "nar r", "narr o",
        "narro w</w>",
    ]
    text_file = "bpe header\n" + "\n".join(merges)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text_file)
        path = f.name
    try:
        py_tok = SimpleTokenizer(path, use_native=False)
        assert py_tok.has_vocab
        cc_tok = NativeBPE(text_file)
        assert cc_tok.sot == py_tok.sot and cc_tok.eot == py_tok.eot
        prompts = [
            "hello grey hair",
            "a person with narrow eyes",
            "The AIR, on   THE  hill!",
            "hair hair hair 123",
            "punctuation... and, commas's",
        ]
        for p in prompts:
            assert cc_tok.encode(p) == py_tok.encode(p), p
    finally:
        os.unlink(path)
