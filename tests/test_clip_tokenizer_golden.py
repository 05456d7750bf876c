"""Golden token-id pinning for the CLIP tokenizer (VERDICT r4 Next #3).

The reference tokenizes with ``clip.tokenize`` (attention/run_attention.py:
1123), whose splitter uses unicode ``\\p{L}/\\p{N}`` classes. This suite pins
the unicode-exact path with ~50 vendored golden sequences
(tests/data/clip_tokenizer_golden.json) covering english face prompts,
accented latin (composed AND decomposed spellings), cyrillic/greek, CJK,
emoji, contractions, digits, and html escapes.

Golden provenance (zero-egress box — openai's 16e6 merges file cannot be
fetched): the ids were generated ONCE by an independent spec-faithful
implementation of openai clip/simple_tokenizer.py written directly from its
published algorithm, then hand-verified for several cases (byte-index
arithmetic of the bytes_to_unicode table, multi-byte UTF-8 symbols, the
end-of-word ``</w>`` merge subtlety) and vendored as literals.

  * With an EMPTY merges list the ids are exactly openai's base vocab: the
    first 256 vocab entries are the bytes_to_unicode symbols in table
    order and the next 256 their ``</w>`` forms — identical ids to the
    real tokenizer's first 512 rows by construction. This pins the
    pattern split, NFC cleaning, byte encoder, and id layout.
  * A synthetic merges list pins the BPE merge loop itself (rank
    priority, repeated application, the ``</w>``-boundary behavior where
    ``('Ã','©')`` must NOT merge word-finally because the last byte
    symbol carries ``</w>``).

The real-merges path shares every one of those code paths; only the rank
table differs (loaded from the file, covered by the loader tests).
"""

import json
import os

import numpy as np
import pytest

from where2edit_tpu.models.clip_tokenizer import (
    _UNICODE_PAT,
    CONTEXT_LENGTH,
    SimpleTokenizer,
    tokenize,
)

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                     "clip_tokenizer_golden.json")))


def _tok_with_merges(tmp_path, merges):
    """Build a SimpleTokenizer from an in-test merges file (the header line
    mirrors the real bpe_simple_vocab_16e6.txt layout)."""
    path = tmp_path / "merges.txt"
    lines = ["#version: 0.2"] + [" ".join(m) for m in merges]
    # the loader slices merges[1 : 49152-256-2+1]; a short file is fine
    path.write_text("\n".join(lines), encoding="utf-8")
    return SimpleTokenizer(bpe_path=str(path), use_native=False)


def test_unicode_pattern_is_active():
    """The baked image ships `regex`; the ASCII fallback is only for
    environments without it (documented non-parity)."""
    assert _UNICODE_PAT


def test_golden_base_vocab_ids(tmp_path):
    """50 prompts against openai-identical base-vocab ids (empty merges)."""
    tok = _tok_with_merges(tmp_path, [])
    for prompt, want in GOLDEN["empty"].items():
        got = tok.encode(prompt)
        assert got == want, f"{prompt!r}: {got} != {want}"


def test_golden_synthetic_merges(tmp_path):
    """BPE merge loop against vendored goldens, incl. the multi-byte 'é'
    merge that must not fire word-finally."""
    tok = _tok_with_merges(tmp_path, GOLDEN["merges"])
    for prompt, want in GOLDEN["syn"].items():
        got = tok.encode(prompt)
        assert got == want, f"{prompt!r}: {got} != {want}"


def test_nfc_normalization_unifies_spellings(tmp_path):
    """ftfy.fix_text NFC-normalizes; composed and decomposed accents must
    produce identical ids."""
    tok = _tok_with_merges(tmp_path, [])
    composed = "café"                  # é
    decomposed = "café"               # e + combining acute
    assert tok.encode(composed) == tok.encode(decomposed)
    assert tok.encode("naïve") == tok.encode("naïve")


def test_native_ascii_path_matches_python(tmp_path):
    """ASCII prompts may take the C++ fast path; ids must equal the Python
    path. Non-ASCII must route around the (ASCII-pattern) native encoder."""
    merges = GOLDEN["merges"]
    t_py = _tok_with_merges(tmp_path, merges)
    path = tmp_path / "merges.txt"
    t_nat = SimpleTokenizer(bpe_path=str(path), use_native=True)
    if t_nat._native is None:
        pytest.skip("native library unavailable")
    for prompt in ["hello grey hair face", "a face with grey hair",
                   "it'll be fine", "#1 fan!"]:
        assert t_nat.encode(prompt) == t_py.encode(prompt), prompt
    # non-ASCII: the unicode-exact Python path answers (would differ under
    # the native ASCII splitter)
    for prompt in ["café face", "灰色头发", "наïve"]:
        assert t_nat.encode(prompt) == t_py.encode(prompt), prompt


def test_tokenize_framing(tmp_path):
    """(N, 77) int32 with SOT/EOT framing and truncation semantics."""
    tok = _tok_with_merges(tmp_path, [])
    arr = tokenize(["grey hair", "x " * 200], tokenizer=tok)
    assert arr.shape == (2, CONTEXT_LENGTH) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot
    n = len(tok.encode("grey hair"))
    assert arr[0, n + 1] == tok.eot and arr[0, n + 2] == 0
    assert arr[1, -1] == tok.eot  # truncated row keeps terminal EOT
    with pytest.raises(RuntimeError):
        tokenize(["x " * 200], tokenizer=tok, truncate=False)
