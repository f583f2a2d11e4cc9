"""Mergeable sketches for corpus statistics at 100 TB scale.

HyperLogLog distinct counting (Flajolet et al. 2007, with the
small-range linear-counting correction from the HLL++ paper): each
`map_batches` task folds its batch into a 2^p-register array (numpy
max-accumulate over batch hashes — no Python loop), registers merge by
elementwise max, and the estimate is read once at the end. The whole
reduction ships p=12 -> 4 KiB per task regardless of input size — the
sketch form of the partial-aggregate discipline the exact operators
use (vs `unique`, whose shuffle moves every distinct value)."""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(2^p) = 1.6%


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold uint64 hashes into a 2^p register array (vectorized)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(hashes):
        return regs
    h = np.asarray(hashes, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    # bit_length via log2 on the nonzero values (exact for uint64 in
    # float80? not guaranteed — use a bit-twiddling ladder instead)
    v = rest[nz]
    bits = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        step = v >> np.uint64(shift)
        big = step != 0
        bits[big] += shift
        v = np.where(big, step, v)
    lz[nz] = 63 - bits
    np.minimum(lz, 64 - p, out=lz)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> float:
    """Bias-corrected cardinality estimate with linear counting for the
    small range (the standard HLL correction schedule)."""
    m = float(1 << p)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


# ---- CountMin sketch (Cormode & Muthukrishnan 2005) for heavy-hitter
# tokens. The scale story: building the exact token frequency table at
# 10^12 docs shuffles a distinct-token table (10^8+ rows) through a
# groupby; the sketch path never shuffles a token anywhere — each task
# folds its batch into a fixed (DEPTH x WIDTH) int64 array plus a
# bounded candidate dict, partials merge by elementwise SUM (CountMin
# is a linear sketch) up a two-level tree, and a second streaming pass
# counts ONLY the broadcast candidates exactly, so the reported top-k
# counts are EXACT (the sketch only chooses who gets counted).

CMS_DEPTH = 4
CMS_WIDTH = 1 << 12  # 4096 -> 128 KiB int64 per partial
# odd multipliers for the per-row index mix (any fixed odd constants)
_CMS_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def cms_indexes(h: np.ndarray) -> np.ndarray:
    """(DEPTH, n) column indexes for uint64 hashes."""
    h = np.asarray(h, dtype=np.uint64)
    mixed = h[None, :] * _CMS_MULT[:, None]
    return (mixed >> np.uint64(64 - 12)).astype(np.int64)  # log2(CMS_WIDTH)


def cms_update(cms: np.ndarray, h: np.ndarray, counts: np.ndarray) -> None:
    idx = cms_indexes(h)
    for r in range(CMS_DEPTH):
        np.add.at(cms[r], idx[r], counts)


def cms_estimate(cms: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Point estimates (upper bounds with prob 1 per row; min over rows)."""
    idx = cms_indexes(h)
    est = cms[0][idx[0]]
    for r in range(1, CMS_DEPTH):
        np.minimum(est, cms[r][idx[r]], out=est)
    return est
