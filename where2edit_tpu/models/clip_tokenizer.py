"""CLIP BPE tokenizer (openai SimpleTokenizer algorithm).

The reference tokenizes via ``clip.tokenize`` (attention/run_attention.py:
1123 etc.). This implementation reproduces the byte-level BPE given the
standard ``bpe_simple_vocab_16e6.txt.gz`` merges file (path via constructor
or $CLIP_BPE_PATH). In weightless/offline environments a deterministic
hash fallback keeps the pipeline runnable (NOT id-compatible with openai —
only for smoke tests; parity requires the merges file).
"""

from __future__ import annotations

import gzip
import hashlib
import html
import os
import re
import unicodedata
from functools import lru_cache

import numpy as np

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408

# openai's token pattern uses unicode \p{L}/\p{N} classes (the `regex`
# module); the stdlib-`re` ASCII approximation is only the fallback when
# `regex` is unavailable. English prompts split identically either way;
# accented/CJK text needs the unicode classes for id parity
# (tests/test_clip_tokenizer_golden.py).
try:
    import regex as _regex

    _PAT = _regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
        r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _regex.IGNORECASE,
    )
    _UNICODE_PAT = True
except ImportError:  # pragma: no cover - regex is in the baked image
    _regex = re
    _PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE,
    )
    _UNICODE_PAT = False


@lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _clean(text: str) -> str:
    """openai basic_clean + whitespace_clean (clip/simple_tokenizer.py).

    ftfy.fix_text (absent here) is mojibake repair + NFC normalization —
    identity on well-formed text; the NFC step is reproduced so composed/
    decomposed accent spellings tokenize identically."""
    text = unicodedata.normalize("NFC", text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class SimpleTokenizer:
    def __init__(self, bpe_path: str | None = None, use_native: bool = True):
        bpe_path = bpe_path or os.environ.get("CLIP_BPE_PATH")
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.has_vocab = bool(bpe_path and os.path.isfile(bpe_path))
        self._native = None
        if self.has_vocab:
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as f:
                raw_text = f.read()
            merges = raw_text.split("\n")
            merges = merges[1: 49152 - 256 - 2 + 1]
            if use_native:
                try:  # C++ fast path (native/w2e_native.cpp), id-compatible
                    from where2edit_tpu.utils.native import NativeBPE  # noqa: PLC0415

                    self._native = NativeBPE(
                        "\n".join(raw_text.split("\n")[:49152 - 256 - 2 + 1]))
                except Exception:
                    self._native = None
            merges = [tuple(m.split()) for m in merges]
            vocab = list(bytes_to_unicode().values())
            vocab = vocab + [v + "</w>" for v in vocab]
            for merge in merges:
                vocab.append("".join(merge))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = dict(zip(vocab, range(len(vocab))))
            self.bpe_ranks = dict(zip(merges, range(len(merges))))
        else:
            self.encoder = {"<|startoftext|>": VOCAB_SIZE - 2,
                            "<|endoftext|>": VOCAB_SIZE - 1}
            self.bpe_ranks = {}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def _hash_ids(self, token: str) -> list[int]:
        h = int(hashlib.sha1(token.encode()).hexdigest(), 16)
        return [h % (VOCAB_SIZE - 2)]

    def encode(self, text: str) -> list[int]:
        cleaned = _clean(text)
        # the C++ fast path splits with the ASCII pattern (native/
        # w2e_native.cpp:343); non-ASCII text takes the Python path whose
        # unicode \p{L}/\p{N} classes match openai exactly
        if self._native is not None and cleaned.isascii():
            return self._native.encode(cleaned)
        ids: list[int] = []
        for token in _regex.findall(_PAT, cleaned):
            if not self.has_vocab:
                ids.extend(self._hash_ids(token))
                continue
            token_b = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token_b).split(" "))
        return ids


_default_tokenizer: SimpleTokenizer | None = None


def tokenize(texts, context_length: int = CONTEXT_LENGTH,
             truncate: bool = True, tokenizer: SimpleTokenizer | None = None
             ) -> np.ndarray:
    """openai clip.tokenize-compatible: (N, 77) int32 with SOT/EOT framing."""
    global _default_tokenizer
    if tokenizer is None:
        if _default_tokenizer is None:
            _default_tokenizer = SimpleTokenizer()
        tokenizer = _default_tokenizer
    if isinstance(texts, str):
        texts = [texts]
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        toks = [tokenizer.sot] + tokenizer.encode(text) + [tokenizer.eot]
        if len(toks) > context_length:
            if not truncate:
                raise RuntimeError(f"input too long for context {context_length}")
            toks = toks[:context_length]
            toks[-1] = tokenizer.eot
        out[i, : len(toks)] = toks
    return out
