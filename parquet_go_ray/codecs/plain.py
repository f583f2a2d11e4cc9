"""PLAIN encoding: little-endian fixed-width arrays; byte arrays as a
4-byte LE length prefix per value (semantics of the reference's
encoding/plain/plain.go:23-156, re-expressed as numpy buffer ops).
"""

from __future__ import annotations

import numpy as np


def encode_fixed(values: np.ndarray) -> bytes:
    """Any fixed-width dtype (int32/int64/float32/float64/uint8...)."""
    return np.ascontiguousarray(values).tobytes()


def decode_fixed(buf: bytes, dtype, n: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=dtype, count=n)


def encode_booleans(values: np.ndarray) -> bytes:
    """Booleans bit-packed LSB-first, one bit per value (plain.go:29-37)."""
    return np.packbits(values.astype(np.uint8), bitorder="little").tobytes()


def decode_booleans(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n + 7) // 8)
    return np.unpackbits(raw, count=n, bitorder="little").astype(bool)


def encode_byte_array(data: bytes, offsets: np.ndarray) -> bytes:
    """4-byte LE length prefix per value + value bytes (plain.go:112-156).

    Vectorized: interleave the length words with the value bytes using a
    single scatter into the output buffer.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    total = int(offsets[-1]) + 4 * n
    out = np.empty(total, dtype=np.uint8)
    # output start of each record = input start + 4 * index
    rec_starts = offsets[:-1] + 4 * np.arange(n, dtype=np.int64)
    # write length words
    lw = lengths.astype(np.uint32).view(np.uint8).reshape(n, 4) if n else np.empty((0, 4), np.uint8)
    for k in range(4):
        out[rec_starts + k] = lw[:, k] if n else 0
    # write value bytes
    if int(offsets[-1]):
        src = np.frombuffer(data, dtype=np.uint8, count=int(offsets[-1]))
        dst_idx = np.repeat(rec_starts + 4, lengths) + (
            np.arange(int(offsets[-1]), dtype=np.int64)
            - np.repeat(offsets[:-1], lengths)
        )
        out[dst_idx] = src
    return out.tobytes()


def _native():
    from . import native

    return native.load("_plain_native.c")


def decode_byte_array(buf: bytes, n: int) -> tuple[bytes, np.ndarray]:
    """Inverse of encode_byte_array -> (data, offsets[int64, n+1]).

    The length words sit at positions that depend on every previous
    length, so the scan is sequential — a C hot loop when a compiler is
    available (the _fsst_native pattern), a Python walk otherwise."""
    offsets = np.zeros(n + 1, dtype=np.int64)
    if n == 0:
        return b"", offsets
    lib = _native()
    if lib is not None:
        import ctypes

        buf = bytes(buf) if not isinstance(buf, bytes) else buf
        fn = lib.plain_ba_offsets
        fn.restype = ctypes.c_long
        rc = fn(
            buf,
            ctypes.c_long(len(buf)),
            ctypes.c_long(n),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        if rc < 0:
            raise ValueError("PLAIN byte-array payload truncated")
        out = np.empty(int(offsets[-1]), dtype=np.uint8)
        lib.plain_ba_compact(
            buf,
            ctypes.c_long(n),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out.tobytes(), offsets
    raw = np.frombuffer(buf, dtype=np.uint8)
    lengths = np.empty(n, dtype=np.int64)
    pos = 0
    mv = raw.view(np.uint8)
    for i in range(n):
        ln = int.from_bytes(mv[pos : pos + 4].tobytes(), "little")
        lengths[i] = ln
        pos += 4 + ln
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    data = np.empty(total, dtype=np.uint8)
    if total:
        rec_starts = offsets[:-1] + 4 * np.arange(1, n + 1, dtype=np.int64)
        src_idx = np.repeat(rec_starts, lengths) + (
            np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        )
        data = raw[src_idx]
    return data.tobytes(), offsets
