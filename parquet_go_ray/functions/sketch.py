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


# ---- KLL-style quantile sketch (Karnin, Lang, Liberty, FOCS 2016) for
# distribution statistics over UNBOUNDED value domains. The exact
# percentile operator (queries.py::q_length_percentiles) shuffles one
# row per DISTINCT value — fine for bounded int ranges, unbounded for
# doubles (latencies, scores, byte sizes). The sketch path ships a
# fixed ~k*log(n/k) doubles per task and merges associatively, the same
# bounded-partial discipline as HLL/CountMin.
#
# Deviation from the paper, on purpose: compaction parity alternates
# DETERMINISTICALLY per level instead of coin-flipping. Randomized
# parity makes the error zero-mean; alternating parity keeps the same
# O(1/k) rank-error envelope (each compaction still displaces ranks by
# at most half its weight, and consecutive displacements cancel) while
# making every pipeline run, resume, and test bit-reproducible — the
# property deterministic_shuffle/stratified_sample already commit to.
# Empirical envelope with k=256: max rank error ~0.4% over 2M values
# (test_quantile_sketch.py pins 1%).

KLL_K = 256


class KLLSketch:
    """Mergeable quantile sketch. Level i holds values of weight 2^i;
    level arrays stay unsorted until their compaction sorts them (numpy
    sort, never per-row Python)."""

    __slots__ = ("k", "levels", "parity", "n")

    def __init__(self, k: int = KLL_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    # -- building -------------------------------------------------------
    def update(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("KLL merge requires equal k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                arr = np.sort(self.levels[i], kind="stable")
                keep = arr[self.parity[i] :: 2]
                self.parity[i] ^= 1
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self.parity.append(0)
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep])
            i += 1

    # -- reading --------------------------------------------------------
    def _weighted(self):
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [
                np.full(len(a), 1 << i, dtype=np.int64)
                for i, a in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], np.cumsum(wts[order])

    def quantile(self, q: float) -> float:
        """Smallest retained value whose estimated rank >= q*n (the
        quantile_disc convention the exact operator uses)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        vals, cum = self._weighted()
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(vals[np.searchsorted(cum, target)])

    def rank(self, x: float) -> int:
        """Estimated number of values <= x."""
        if self.n == 0:
            return 0
        vals, cum = self._weighted()
        i = np.searchsorted(vals, x, side="right")
        return int(cum[i - 1]) if i else 0

    # -- wire form (rides pandas partials like the HLL registers) -------
    def to_bytes(self) -> bytes:
        parts = [
            np.array([self.k, self.n, len(self.levels)], dtype=np.int64).tobytes(),
            np.array(self.parity, dtype=np.int8).tobytes(),
        ]
        for a in self.levels:
            parts.append(np.array([len(a)], dtype=np.int64).tobytes())
            parts.append(a.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        k, n, nlev = np.frombuffer(blob[:24], dtype=np.int64)
        s = cls(int(k))
        s.n = int(n)
        off = 24
        s.parity = list(
            np.frombuffer(blob[off : off + nlev], dtype=np.int8).astype(int)
        )
        off += int(nlev)
        s.levels = []
        for _ in range(int(nlev)):
            (ln,) = np.frombuffer(blob[off : off + 8], dtype=np.int64)
            off += 8
            s.levels.append(
                np.frombuffer(blob[off : off + 8 * int(ln)], dtype=np.float64).copy()
            )
            off += 8 * int(ln)
        return s
