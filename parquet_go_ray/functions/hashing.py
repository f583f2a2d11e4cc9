"""Vectorized stable hashing primitives: row hashes, MinHash, SimHash,
and a split-block-style Bloom filter.

All deterministic across processes (fixed keys/seeds — the analogue of
the reference's fixed xxhash seeds in bloom/xxhash, bloom.go:99-117).
No Python loops over rows: shingle windows come from byte-level numpy
views, per-document reductions use np.minimum.reduceat / np.add.reduceat
over offset boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = np.uint64((1 << 61) - 1)
_U64 = np.uint64


def stable_hash_strings(values) -> np.ndarray:
    """Deterministic uint64 hash of an array of str/bytes (fixed key)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr).astype(np.uint64)


def _concat_bytes(texts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    data = b"".join(texts)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in texts], out=offsets[1:])
    return np.frombuffer(data, dtype=np.uint8), offsets


def content_hash128(texts: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content key as two independent XXH64 batch hashes (plain
    bytes, and with a 1-byte domain suffix so the second hash is not a
    function of the first). Same collision guarantee as the md5 key it
    replaced in the exact-dedup path (~1e-14 expected collisions at
    10^12 docs) at C-kernel batch speed instead of a per-row hashlib
    loop. Returns (h1, h2) uint64 arrays."""
    from ..codecs.sbbf import xxhash64

    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    off1 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off1[1:])
    h1 = xxhash64(b"".join(texts), off1)
    # suffixed layout: t0 01 t1 01 ... tn 01 — segment i = t_i + b"\x01"
    off2 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=off2[1:])
    h2 = xxhash64(b"\x01".join(texts) + b"\x01", off2)
    return h1, h2


def _shingle_windows(buf: np.ndarray, offsets: np.ndarray, k: int):
    """uint64 rolling k-byte windows for each doc; returns (hashes,
    doc_starts) where doc_starts indexes the per-doc segments for
    reduceat. Docs shorter than k contribute one (padded) window."""
    n_docs = len(offsets) - 1
    lengths = np.diff(offsets)
    n_win = np.maximum(lengths - k + 1, 1)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_win, out=starts[1:])
    total = int(starts[-1])
    # absolute byte position of each window start
    pos = np.repeat(offsets[:-1], n_win) + (
        np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], n_win)
    )
    pad = np.zeros(len(buf) + k, dtype=np.uint64)
    pad[: len(buf)] = buf
    # windows never read past their OWN doc's end (docs shorter than k
    # zero-pad): a window that leaked into the next doc's bytes made
    # short-doc hashes depend on batch composition — nondeterministic
    # across block layouts
    ends = np.repeat(offsets[1:], n_win)
    w = np.where(pos < ends, pad[pos], 0)
    for i in range(1, k):
        w = w * _U64(1099511628211) + np.where(pos + i < ends, pad[pos + i], 0)
    return w, starts[:-1], n_docs


def minhash_signatures(
    texts: list[bytes], k: int = 4, num_perm: int = 64, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over k-byte shingles."""
    n_docs = len(texts)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_docs == 0:
        return out
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64) | _U64(1)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    from ..codecs import native

    lib = native.load("_hash_native.c")
    if lib is not None:
        # fully fused C path: shingle + permute + min in ONE pass over
        # the concatenated bytes, zero large temporaries — the numpy
        # path below allocates several n_shingles×8B arrays (~0.5 GB
        # per 60 MB of text) whose first-touch page faults dominate
        # its runtime. Output is bit-identical.
        import ctypes

        data = b"".join(texts)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum([len(t) for t in texts], out=offsets[1:])
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.minhash_segments(
            data,
            ctypes.c_long(len(data)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ctypes.c_long(n_docs),
            ctypes.c_long(k),
            a.ctypes.data_as(u64p),
            b.ctypes.data_as(u64p),
            ctypes.c_long(num_perm),
            out.ctypes.data_as(u64p),
        )
        return out
    buf, offsets = _concat_bytes(texts)
    w, starts, _ = _shingle_windows(buf, offsets, k)
    if len(w) == 0:
        return out
    for p in range(num_perm):
        with np.errstate(over="ignore"):
            h = (w * a[p] + b[p]) & _MERSENNE
        out[:, p] = np.minimum.reduceat(h, starts)
    return out


def lsh_band_keys(
    signatures: np.ndarray, bands: int = 16
) -> np.ndarray:
    """(n_docs, bands) uint64 band keys (hash of each band's rows)."""
    n, p = signatures.shape
    rows = p // bands
    sig = signatures[:, : bands * rows].reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        key = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows):
            key = key * _U64(1099511628211) + sig[:, :, r]
    return key


def winnow_fingerprints(
    texts: list[bytes], k: int = 8, w: int = 16
) -> list[np.ndarray]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): rolling k-byte hashes, sliding-window-of-w minima,
    distinct minima per doc. Fully vectorized — rolling hashes from the
    shared shingle kernel, window minima via a strided view. Returns one
    sorted uint64 fingerprint array per doc; near-duplicate documents
    share most fingerprints, identical documents all of them."""
    n_docs = len(texts)
    out: list[np.ndarray] = [np.empty(0, dtype=np.uint64)] * n_docs
    if n_docs == 0:
        return out
    from ..codecs import native

    lib = native.load("_hash_native.c")
    if lib is not None:
        # fused C path: rolling hash + monotonic-deque window minima +
        # sort/dedupe in one pass, no n×w strided temporary. Bit-equal
        # to the numpy path (np.unique = sorted distinct).
        import ctypes

        data = b"".join(texts)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum([len(t) for t in texts], out=offsets[1:])
        n_win = np.maximum(np.diff(offsets) - k + 1, 1)
        vals = np.empty(int(n_win.sum()), dtype=np.uint64)
        counts = np.empty(n_docs, dtype=np.int64)
        lib.winnow_segments(
            data,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ctypes.c_long(n_docs),
            ctypes.c_long(k),
            ctypes.c_long(w),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        bounds = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        return [
            vals[bounds[i] : bounds[i + 1]].copy() for i in range(n_docs)
        ]
    buf, offsets = _concat_bytes(texts)
    h, starts, _ = _shingle_windows(buf, offsets, k)
    if len(h) == 0:
        return out
    ends = np.append(starts[1:], len(h))
    for i in range(n_docs):
        hw = h[starts[i] : ends[i]]
        if not len(hw):
            continue
        if len(hw) <= w:
            out[i] = np.unique(hw.min(keepdims=True))
            continue
        mins = np.lib.stride_tricks.sliding_window_view(hw, w).min(axis=1)
        out[i] = np.unique(mins)
    return out


def winnow_digest(fps: list[np.ndarray]) -> np.ndarray:
    """Order-insensitive 64-bit digest of each doc's fingerprint set
    (sum of splitmixed fingerprints mod 2^64)."""
    out = np.empty(len(fps), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, f in enumerate(fps):
            out[i] = np.add.reduce(splitmix64(f), dtype=np.uint64) if len(f) else _U64(0)
    return out


# ASCII whitespace, the same set bytes.split() uses
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[[9, 10, 11, 12, 13, 32]] = True


def passage_hashes(
    texts: list[bytes], n_words: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """XXH64 of every sliding n_words-word passage per doc. Returns
    (doc_idx int64, hashes uint64) — one row per window, in document
    order. The hashed bytes are sliced straight from the original text
    (start of word i through end of word i+n-1), so on single-space-
    separated corpora each hash keys exactly the SQL string
    array_to_string(words[i : i+n-1], ' ') — which is what makes the
    passage-dedup gate query oracle-checkable. Docs shorter than
    n_words contribute no windows. Fully vectorized: byte-mask token
    boundaries, arange/repeat window indexing, one gather (n_words× the
    batch's text bytes — bounded per batch), one batch hash call."""
    n_docs = len(texts)
    if n_docs == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    buf, offsets = _concat_bytes(texts)
    if len(buf) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    keep = ~_WS_LUT[buf]
    prev_keep = np.empty_like(keep)
    prev_keep[0] = False
    prev_keep[1:] = keep[:-1]
    doc_starts = offsets[:-1][offsets[:-1] < len(buf)]
    prev_keep[doc_starts] = False
    next_keep = np.empty_like(keep)
    next_keep[-1] = False
    next_keep[:-1] = keep[1:]
    doc_last = offsets[1:] - 1
    next_keep[doc_last[doc_last >= 0]] = False
    tok_start = np.flatnonzero(keep & ~prev_keep)
    tok_end = np.flatnonzero(keep & ~next_keep)  # inclusive last byte
    tok_doc = np.searchsorted(offsets[1:], tok_start, side="right")
    per_doc = np.bincount(tok_doc, minlength=n_docs)
    doc_tok_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(per_doc, out=doc_tok_start[1:])
    n_win = np.maximum(per_doc - n_words + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
    win_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_win, out=win_starts[1:])
    first_tok = (
        np.arange(total, dtype=np.int64)
        - np.repeat(win_starts[:-1], n_win)
        + np.repeat(doc_tok_start[:-1], n_win)
    )
    p_start = tok_start[first_tok]
    p_end = tok_end[first_tok + n_words - 1] + 1
    lens = p_end - p_start
    out_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    gidx = (
        np.arange(int(out_off[-1]), dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
        + np.repeat(p_start, lens)
    )
    from ..codecs.sbbf import xxhash64

    return doc_idx, xxhash64(buf[gidx].tobytes(), out_off)


def block_bounds(
    texts: list[bytes], n_words: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """TUMBLING n_words-word block byte bounds per doc (tail block may
    be shorter; every non-empty doc gets >=1 block). Returns (doc_idx,
    block_idx, byte_start, byte_end_exclusive) into the concatenation
    of `texts` — block i of a doc covers words i*n .. min((i+1)*n, W)-1
    sliced from the original bytes, i.e. exactly the SQL string
    array_to_string(words[i*n+1 : i*n+n], ' ') on single-space text.
    Shared plumbing for passage_dedupe's hash and reconstruct stages."""
    n_docs = len(texts)
    empty = (
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
        np.zeros(0, dtype=np.int64),
    )
    if n_docs == 0:
        return empty
    buf, offsets = _concat_bytes(texts)
    if len(buf) == 0:
        return empty
    keep = ~_WS_LUT[buf]
    prev_keep = np.empty_like(keep)
    prev_keep[0] = False
    prev_keep[1:] = keep[:-1]
    doc_starts = offsets[:-1][offsets[:-1] < len(buf)]
    prev_keep[doc_starts] = False
    next_keep = np.empty_like(keep)
    next_keep[-1] = False
    next_keep[:-1] = keep[1:]
    doc_last = offsets[1:] - 1
    next_keep[doc_last[doc_last >= 0]] = False
    tok_start = np.flatnonzero(keep & ~prev_keep)
    tok_end = np.flatnonzero(keep & ~next_keep)
    tok_doc = np.searchsorted(offsets[1:], tok_start, side="right")
    per_doc = np.bincount(tok_doc, minlength=n_docs)
    n_blk = -(-per_doc // n_words)  # ceil; 0 for token-less docs
    total = int(n_blk.sum())
    if total == 0:
        return empty
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_blk)
    blk_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_blk, out=blk_starts[1:])
    block_idx = np.arange(total, dtype=np.int64) - np.repeat(
        blk_starts[:-1], n_blk
    )
    doc_tok_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(per_doc, out=doc_tok_start[1:])
    first_tok = doc_tok_start[doc_idx] + block_idx * n_words
    last_tok = np.minimum(
        first_tok + n_words - 1, doc_tok_start[doc_idx] + per_doc[doc_idx] - 1
    )
    return doc_idx, block_idx, tok_start[first_tok], tok_end[last_tok] + 1


def block_hashes(
    texts: list[bytes], n_words: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """XXH64 of each tumbling n_words-word block (see block_bounds).
    Returns (doc_idx, block_idx, hashes uint64)."""
    doc_idx, block_idx, b0, b1 = block_bounds(texts, n_words)
    if len(doc_idx) == 0:
        return doc_idx, block_idx, np.zeros(0, dtype=np.uint64)
    buf, _ = _concat_bytes(texts)
    lens = b1 - b0
    out_off = np.zeros(len(b0) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    gidx = (
        np.arange(int(out_off[-1]), dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
        + np.repeat(b0, lens)
    )
    from ..codecs.sbbf import xxhash64

    return doc_idx, block_idx, xxhash64(buf[gidx].tobytes(), out_off)


def _tokenize_bytes(texts: list[bytes]):
    """Whitespace tokenization without Python token objects: byte-mask
    the concatenated buffer, compact out the whitespace, and return
    (compacted bytes, per-token offsets into it, per-doc token starts).
    Token boundaries = whitespace runs and document boundaries, exactly
    matching bytes.split() per doc."""
    n_docs = len(texts)
    buf, offsets = _concat_bytes(texts)
    if len(buf) == 0:
        return (
            buf,
            np.zeros(1, dtype=np.int64),
            np.zeros(n_docs + 1, dtype=np.int64),
        )
    keep = ~_WS_LUT[buf]
    prev_keep = np.empty_like(keep)
    prev_keep[0] = False
    prev_keep[1:] = keep[:-1]
    doc_starts = offsets[:-1][offsets[:-1] < len(buf)]
    prev_keep[doc_starts] = False  # a doc boundary always starts a token
    next_keep = np.empty_like(keep)
    next_keep[-1] = False
    next_keep[:-1] = keep[1:]
    doc_last = offsets[1:] - 1
    next_keep[doc_last[doc_last >= 0]] = False  # and always ends one
    tok_byte_pos = np.flatnonzero(keep & ~prev_keep)
    tok_end_pos = np.flatnonzero(keep & ~next_keep)
    comp = buf[keep]
    # tokens are contiguous in the compacted buffer, so offsets are just
    # the running sum of token lengths (NOT a full-buffer cumsum — that
    # 8×|buf| temporary dominated this function's runtime)
    tok_offsets = np.zeros(len(tok_byte_pos) + 1, dtype=np.int64)
    np.cumsum(tok_end_pos - tok_byte_pos + 1, out=tok_offsets[1:])
    # per-doc token counts -> doc token starts
    docids = np.searchsorted(offsets[1:], tok_byte_pos, side="right")
    per_doc = np.bincount(docids, minlength=n_docs)
    doc_tok_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(per_doc, out=doc_tok_starts[1:])
    return comp, tok_offsets, doc_tok_starts


def simhash64(texts: list[bytes], seed: int = 11) -> np.ndarray:
    """64-bit SimHash over whitespace tokens. Fully vectorized: numpy
    byte-mask tokenization (no Python token objects), XXH64 token hashes
    via the shared C segment kernel, per-doc ±1 bit accumulation in C
    (numpy reduceat fallback). Per-doc independent — a doc's fingerprint
    never depends on batch composition."""
    n_docs = len(texts)
    if n_docs == 0:
        return np.zeros(0, dtype=np.uint64)
    from ..codecs.sbbf import xxhash64

    comp, tok_offsets, doc_tok_starts = _tokenize_bytes(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    n_tokens = len(tok_offsets) - 1
    if n_tokens == 0:
        return out
    h = xxhash64(comp.tobytes(), tok_offsets)
    from ..codecs import native

    lib = native.load("_hash_native.c")
    if lib is not None:
        import ctypes

        lib.simhash_accumulate(
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            doc_tok_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ctypes.c_long(n_docs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out
    acc = np.zeros((n_docs, 64), dtype=np.int64)
    valid = np.diff(doc_tok_starts) > 0
    # reduceat over VALID docs only: clipping empty docs' starts into
    # range would shorten the PRECEDING doc's segment (its last token
    # fell out whenever an empty doc followed it in the batch)
    vstarts = doc_tok_starts[:-1][valid]
    for bit in range(64):
        bits = ((h >> _U64(bit)) & _U64(1)).astype(np.int64) * 2 - 1
        acc[valid, bit] = np.add.reduceat(bits, vstarts)
    bitsset = (acc > 0).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    return (bitsset << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (deterministic)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + _U64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


# blocked layout (the reference's split-block shape, bloom/block.go:17-28):
# all k bits of one id land in a single 512-bit block, so the distributed
# builder shuffles ONE (slice, hash) row per id instead of k position
# rows, and a probe touches one cache line
ID_BLOOM_BLOCK_BITS = 512


def id_bloom_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions for PRE-MIXED uint64 hashes in an
    m_bits-bit blocked Bloom filter (m_bits a multiple of 512). Shared by
    the distributed slice builder and the probe so positions can never
    drift; callers mix raw ids with splitmix64 first."""
    h = np.asarray(hashes, dtype=np.uint64)
    n_blocks = m_bits // ID_BLOOM_BLOCK_BITS
    base = (h % _U64(n_blocks)).astype(np.int64) * ID_BLOOM_BLOCK_BITS
    offs = np.empty((len(h), k), dtype=np.int64)
    for j in range(k):
        offs[:, j] = ((h >> _U64(17 + 9 * j)) & _U64(ID_BLOOM_BLOCK_BITS - 1)).astype(
            np.int64
        )
    return base[:, None] + offs


def id_bloom_probe(
    bitmap: np.ndarray, m_bits: int, k: int, ids: np.ndarray
) -> np.ndarray:
    """Boolean membership mask for uint64 ids (no false negatives)."""
    if not len(ids):
        return np.zeros(0, dtype=bool)
    idx = id_bloom_positions(splitmix64(ids), m_bits, k)
    got = (bitmap[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return got.all(axis=1)


class BloomFilter:
    """Vectorized Bloom filter (double hashing), analogous in role to the
    reference's split-block filter (bloom/filter.go:36-40); used for
    semi-join / membership pre-filtering with exact verification after."""

    def __init__(self, keys, bits_per_key: int = 16, k: int = 7):
        n = max(1, len(keys))
        # m is a whole number of bytes so a filter rebuilt from its
        # serialized bits (m = len(bits) * 8) probes identical positions
        self.m = ((int(n * bits_per_key) + 7) // 8) * 8
        self.k = k
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)
        if len(keys):
            h = stable_hash_strings(keys)
            self._set(h)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h % _U64(self.m)
        h2 = (h >> _U64(17) | _U64(1)) % _U64(self.m)
        idx = (
            h1[:, None] + np.arange(self.k, dtype=np.uint64)[None, :] * h2[:, None]
        ) % _U64(self.m)
        return idx.astype(np.int64)

    def _set(self, h: np.ndarray) -> None:
        idx = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        idx = self._positions(h)
        got = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return got.all(axis=1)

    def contains(self, keys) -> np.ndarray:
        return self.contains_hashes(stable_hash_strings(keys))

    def to_bytes(self) -> bytes:
        """Self-describing sidecar: version, k and m travel with the bits
        so probe-time parameters can never drift from encode-time ones."""
        import struct

        return struct.pack("<BBI", 1, self.k, self.m) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        import struct

        version, k, m = struct.unpack_from("<BBI", buf, 0)
        if version != 1:
            raise ValueError(f"unknown bloom sidecar version {version}")
        bf = cls.__new__(cls)
        bf.k = k
        bf.m = m
        bf.bits = np.frombuffer(buf, dtype=np.uint8, offset=6).copy()
        return bf


def hash_embeddings(
    texts: list[bytes], dim: int = 256, k: int = 3, seed: int = 17
) -> np.ndarray:
    """Deterministic text embeddings via the hashing trick (feature
    hashing, Weinberger et al. 2009): every rolling k-byte shingle
    hashes to one of `dim` buckets with a +/-1 sign, per-doc bucket
    sums are L2-normalized. A real, model-free featurizer — not a
    stub — whose cosine approximates shingle-profile similarity, so it
    composes with every embedding operator (cosine_pairs,
    semantic_dedupe, LSH, IVF) to give text-to-embedding pipelines with
    no external model dependency. Fully vectorized: one bincount over
    (doc, bucket) indices; no per-doc Python.

    Returns (n_docs, dim) float64 rows (unit norm; all-zero docs stay
    zero)."""
    n_docs = len(texts)
    out = np.zeros((n_docs, dim), dtype=np.float64)
    if n_docs == 0:
        return out
    buf, offsets = _concat_bytes(texts)
    w, starts, _ = _shingle_windows(buf, offsets, k)
    if len(w) == 0:
        return out
    mix = splitmix64(w ^ _U64(seed))
    bucket = (mix % _U64(dim)).astype(np.int64)
    sign = 1.0 - 2.0 * ((mix >> _U64(32)) & _U64(1)).astype(np.float64)
    counts = np.diff(np.append(starts, len(w)))
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    out = np.bincount(
        doc_idx * dim + bucket, weights=sign, minlength=n_docs * dim
    ).reshape(n_docs, dim)
    norms = np.linalg.norm(out, axis=1)
    np.divide(out, norms[:, None], out=out, where=norms[:, None] > 0)
    return out


def _spread_bits31(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 31 bits of x to every other bit position
    (b30..b0 -> bit positions 60,58,...,0) — classic 2-D Morton
    spreading with mask-shift passes, vectorized over uint64."""
    x = np.asarray(x, dtype=np.uint64) & _U64((1 << 31) - 1)
    x = (x | (x << _U64(16))) & _U64(0x0000FFFF0000FFFF)
    x = (x | (x << _U64(8))) & _U64(0x00FF00FF00FF00FF)
    x = (x | (x << _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U64(2))) & _U64(0x3333333333333333)
    x = (x | (x << _U64(1))) & _U64(0x5555555555555555)
    return x


def morton_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Z-order (Morton) key interleaving two nonnegative int columns,
    each quantized by the CALLER to <= 31 bits. Sorting by this key
    clusters rows so that a range predicate on EITHER column maps to
    a bounded set of key ranges — the multi-column locality a single-
    column sort cannot give (Morton 1966; standard in columnar stores
    as Z-ORDER BY). Returns nonnegative int64 keys (a in even bit
    positions, b in odd)."""
    return (
        _spread_bits31(a) | (_spread_bits31(b) << _U64(1))
    ).view(np.int64)


# --- deterministic bucket assignment (storage-partitioned joins) ---------
#
# Two encode stores bucketed with the SAME (num_buckets, hash kind) are
# co-partitioned by construction: equal join keys land in equal bucket
# indexes on both sides, so a join between them needs no shuffle at any
# scale (one task per bucket pair). The hash must therefore be a pure
# function of the key VALUE — never of column name, table, or process —
# and versioned: a store records ("pgr-bucket-v1", kind) in its job
# meta, and storage_partitioned_join refuses to pair stores whose specs
# differ.

BUCKET_HASH_VERSION = "pgr-bucket-v1"


def bucket_kind(dtype) -> str:
    """'int' | 'str' — the value domain the bucket hash runs in. Int and
    string keys use different hash functions (splitmix64 vs the string
    hash), so a cross-kind join cannot be co-bucketed; the spec records
    the kind to make that mismatch an explicit error."""
    import pyarrow as pa

    if pa.types.is_integer(dtype):
        return "int"
    if (
        pa.types.is_string(dtype)
        or pa.types.is_large_string(dtype)
        or pa.types.is_binary(dtype)
        or pa.types.is_large_binary(dtype)
    ):
        return "str"
    raise TypeError(f"unsupported bucket key type {dtype}")


def bucket_ids(values, num_buckets: int) -> np.ndarray:
    """Deterministic int32 bucket index per value (nulls -> bucket 0;
    null keys never match an equi-join anyway). Accepts a pyarrow
    Array/ChunkedArray or numpy array; integers are mixed through
    splitmix64 (identity % B would put every key of one customer range
    in one bucket), strings through the fixed-key string hash."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        kind = bucket_kind(values.type)
        if kind == "int":
            v = pc.fill_null(values, 0).cast(pa.int64()).to_numpy()
            h = splitmix64(v.view(np.uint64))
        else:
            v = pc.fill_null(values, "").to_numpy(zero_copy_only=False)
            h = stable_hash_strings(v)
    else:
        v = np.asarray(values)
        if v.dtype.kind in "iu":
            h = splitmix64(v.astype(np.int64).view(np.uint64))
        else:
            h = stable_hash_strings(v)
    return (h % _U64(max(1, num_buckets))).astype(np.int32)
