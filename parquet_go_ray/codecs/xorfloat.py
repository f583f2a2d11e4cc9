"""XOR-previous float codec (byte-aligned Gorilla variant).

Spec lineage: Facebook Gorilla (Pelkonen et al., VLDB 2015) compresses
time-series doubles by XORing each value with its predecessor and
storing only the nonzero window of the XOR, because successive samples
share sign/exponent and high mantissa bits. The original is
bit-granular and inherently sequential; this variant quantizes the
window to BYTE boundaries so both directions vectorize:

  wire: u32 n | u8 width | n control bytes | packed windows
  control byte: (start_byte << 4) | span_bytes, where the XOR word's
  nonzero bytes live at [start, start+span) in little-endian order
  (span 0 = value identical to its predecessor = 1 byte total).

Encode is one XOR pass + one reshape + one fancy-index gather; decode
is one scatter + np.bitwise_xor.accumulate — no per-value Python. The
byte alignment costs ~4 bits/value vs true Gorilla but keeps the codec
at memory bandwidth, the same trade BYTE_STREAM_SPLIT makes. Bit-exact
for every payload including NaN/±inf/-0.0 (pure integer ops on the
raw words). The automatic selector (selector.py) only picks it when it
measures smaller than PLAIN/DICT/BYTE_STREAM_SPLIT on the chunk, so
random-mantissa data never regresses.
"""

from __future__ import annotations

import struct

import numpy as np

_UINT = {4: np.uint32, 8: np.uint64}


def encode(values: np.ndarray) -> bytes:
    """values: np.float32 or np.float64 1-D array (null-free)."""
    width = values.dtype.itemsize
    if width not in _UINT:
        raise ValueError(f"xor_float supports float32/float64, got {values.dtype}")
    n = len(values)
    head = struct.pack("<IB", n, width)
    if n == 0:
        return head
    u = np.ascontiguousarray(values).view(_UINT[width])
    x = u.copy()
    x[1:] ^= u[:-1]
    b = x.view(np.uint8).reshape(n, width)
    nz = b != 0
    any_nz = nz.any(axis=1)
    # lowest / highest nonzero byte index per word (little-endian)
    lo = nz.argmax(axis=1)
    hi = width - 1 - nz[:, ::-1].argmax(axis=1)
    start = np.where(any_nz, lo, 0).astype(np.uint8)
    span = np.where(any_nz, hi - lo + 1, 0).astype(np.uint8)
    control = (start << 4) | span
    total = int(span.sum())
    if total == 0:
        return head + control.tobytes()
    offs = np.concatenate(([0], np.cumsum(span.astype(np.int64))))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(offs, span)
    flat = (
        np.repeat(np.arange(n, dtype=np.int64) * width + start, span) + within
    )
    return head + control.tobytes() + b.ravel()[flat].tobytes()


def decode(payload: bytes, dtype) -> np.ndarray:
    n, width = struct.unpack_from("<IB", payload, 0)
    dtype = np.dtype(dtype)
    if dtype.itemsize != width:
        raise ValueError(
            f"xor_float chunk is {width}-byte floats, requested {dtype}"
        )
    if n == 0:
        return np.zeros(0, dtype=dtype)
    control = np.frombuffer(payload, dtype=np.uint8, count=n, offset=5)
    start = (control >> 4).astype(np.int64)
    span = (control & 0x0F).astype(np.int64)
    total = int(span.sum())
    b = np.zeros(n * width, dtype=np.uint8)
    if total:
        packed = np.frombuffer(
            payload, dtype=np.uint8, count=total, offset=5 + n
        )
        offs = np.concatenate(([0], np.cumsum(span)))[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(offs, span)
        flat = (
            np.repeat(np.arange(n, dtype=np.int64) * width + start, span)
            + within
        )
        b[flat] = packed
    x = b.view(_UINT[width])
    return np.bitwise_xor.accumulate(x).view(dtype)
