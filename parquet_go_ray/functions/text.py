"""Vectorized text-analysis functions for large-scale training-data
pipelines: token counting, quality stats, fingerprinting, n-gram
language-ID profiles. All operate on whole Arrow/pandas batches."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-zA-Z0-9]+"


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Count of [a-zA-Z0-9]+ token matches per value (int64)."""
    return pc.cast(pc.count_substring_regex(texts, TOKEN_RE), pa.int64())


def char_stats(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Per-row quality counters: chars, spaces, punct, digits."""
    return {
        "chars": pc.cast(pc.utf8_length(texts), pa.int64()),
        "spaces": pc.cast(pc.count_substring(texts, " "), pa.int64()),
        "punct": pc.cast(pc.count_substring_regex(texts, r"[.!?,;:]"), pa.int64()),
        "digits": pc.cast(pc.count_substring_regex(texts, r"[0-9]"), pa.int64()),
    }


def gopher_quality(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Gopher-style document-quality features + keep decision (Rae et
    al. 2021 rules, the deterministic subset): word count bounds, mean
    word length bounds, minimum alphabetic ratio. All RE2 Arrow
    kernels; every feature is defined so a SQL oracle computes the
    identical value (counts of regex matches, exact integer/rounded
    arithmetic)."""
    n_words = pc.cast(pc.count_substring_regex(texts, r"\S+"), pa.int64())
    n_ws = pc.cast(pc.count_substring_regex(texts, r"\s"), pa.int64())
    chars = pc.cast(pc.utf8_length(texts), pa.int64())
    alpha = pc.cast(pc.count_substring_regex(texts, r"[a-zA-Z]"), pa.int64())
    words_nz = pc.max_element_wise(n_words, pa.scalar(1, pa.int64()))
    chars_nz = pc.max_element_wise(chars, pa.scalar(1, pa.int64()))
    # half-away rounding to match SQL ROUND (Arrow defaults to
    # half-to-even: 4.28125 would hash-mismatch the oracle at .2812)
    mean_wl = pc.round(
        pc.divide(
            pc.cast(pc.subtract(chars, n_ws), pa.float64()),
            pc.cast(words_nz, pa.float64()),
        ),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    alpha_ratio = pc.round(
        pc.divide(
            pc.cast(alpha, pa.float64()), pc.cast(chars_nz, pa.float64())
        ),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(n_words, pa.scalar(10, pa.int64())),
            pc.less_equal(n_words, pa.scalar(100_000, pa.int64())),
        ),
        pc.and_(
            pc.and_(
                pc.greater_equal(mean_wl, pa.scalar(2.0)),
                pc.less_equal(mean_wl, pa.scalar(12.0)),
            ),
            pc.greater(alpha_ratio, pa.scalar(0.6)),
        ),
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "alpha_ratio": alpha_ratio,
        "keep": keep,
    }


def md5_fingerprints(texts: list[str]) -> list[str]:
    """Hex MD5 per text (matches DuckDB's md5())."""
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def char_trigram_profile(texts: list[str], top: int = 200) -> dict[bytes, float]:
    """Frequency profile of byte trigrams over a text sample."""
    from .hashing import _concat_bytes, _shingle_windows

    if not texts:
        return {}
    buf, offsets = _concat_bytes([t.encode() for t in texts])
    w, _, _ = _shingle_windows(buf, offsets, 3)
    uniq, counts = np.unique(w, return_counts=True)
    order = np.argsort(-counts.astype(np.int64), kind="stable")[:top]
    total = counts.sum()
    return {int(uniq[i]): float(counts[i]) / total for i in order}


class NgramLanguageID:
    """N-gram-heuristic language identifier.

    Profiles are built once from a labeled sample (deterministic); each
    batch is scored by cosine similarity of its trigram counts against
    every profile — all vectorized. Designed as an actor-pool stage
    (profiles built in __init__, per-batch scoring in __call__)."""

    def __init__(self, samples: dict[str, list[str]], top: int = 200):
        self.langs = sorted(samples)
        profiles = []
        vocab: dict[int, int] = {}
        raw = {lang: char_trigram_profile(samples[lang], top) for lang in self.langs}
        for p in raw.values():
            for g in p:
                vocab.setdefault(g, len(vocab))
        self.vocab = vocab
        mat = np.zeros((len(self.langs), len(vocab)))
        for i, lang in enumerate(self.langs):
            for g, f in raw[lang].items():
                mat[i, vocab[g]] = f
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self.profiles = mat / np.maximum(norms, 1e-12)

    def predict(self, texts: list[str]) -> list[str]:
        from .hashing import _concat_bytes, _shingle_windows

        if not texts:
            return []
        buf, offsets = _concat_bytes([t.encode() for t in texts])
        w, starts, n_docs = _shingle_windows(buf, offsets, 3)
        # map trigram -> vocab id (unknown -> -1)
        vocab_keys = np.fromiter(self.vocab.keys(), dtype=np.uint64, count=len(self.vocab))
        vocab_vals = np.fromiter(self.vocab.values(), dtype=np.int64, count=len(self.vocab))
        order = np.argsort(vocab_keys)
        sk, sv = vocab_keys[order], vocab_vals[order]
        pos = np.searchsorted(sk, w)
        pos_c = np.minimum(pos, len(sk) - 1)
        known = sk[pos_c] == w
        col = np.where(known, sv[pos_c], -1)
        # per-doc trigram count vectors via a sparse accumulation
        doc_of = np.repeat(
            np.arange(n_docs), np.diff(np.concatenate((starts, [len(w)])))
        )
        mat = np.zeros((n_docs, len(self.vocab)))
        sel = col >= 0
        np.add.at(mat, (doc_of[sel], col[sel]), 1.0)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat /= np.maximum(norms, 1e-12)
        scores = mat @ self.profiles.T
        best = np.argmax(scores, axis=1)
        return [self.langs[i] for i in best]
