"""Deprecated BIT_PACKED level encoding (big-endian bit order).

Decode-compat parity with the reference's encoding/bitpacked
(bitpacked.go:8-119): the legacy Parquet BIT_PACKED scheme packs level
values MSB-first (unlike the RLE/bit-packed hybrid's LSB-first order).
The reference keeps it for reading old files; we mirror that: encode is
provided for tests, decode is the compat path.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned values MSB-first at the given bit width."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="big").tobytes()


def decode(buf: bytes, width: int, n: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    nbits = n * width
    raw = np.frombuffer(buf, dtype=np.uint8, count=(nbits + 7) // 8)
    bits = np.unpackbits(raw, count=nbits, bitorder="big").reshape(n, width)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
