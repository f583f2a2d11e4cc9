"""Shared low-level helpers: varints, zigzag, bit packing, crc.

Wire-format conventions follow the public Parquet encoding spec (the same
formats implemented by the reference's encoding/ package, e.g.
/root/reference/encoding/rle/rle.go and encoding/delta/binary_packed.go) —
re-derived from the spec and re-implemented vectorized in numpy; round-trip
equality (decode(encode(x)) == x) is the correctness contract.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- varints

_U64 = np.uint64


def uvarint_encode(value: int) -> bytes:
    """LEB128 unsigned varint."""
    out = bytearray()
    v = int(value)
    if v < 0:
        raise ValueError("uvarint requires non-negative value")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def uvarint_decode(buf, pos: int) -> tuple[int, int]:
    """Return (value, new_pos)."""
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag_encode(value: int, bits: int = 64) -> int:
    """Map signed -> unsigned (zigzag), modular in `bits`."""
    mask = (1 << bits) - 1
    v = value & mask
    # interpret as signed
    if v >> (bits - 1):
        v -= 1 << bits
    return ((v << 1) ^ (v >> (bits - 1))) & mask


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def svarint_encode(value: int, bits: int = 64) -> bytes:
    return uvarint_encode(zigzag_encode(value, bits))


def svarint_decode(buf, pos: int) -> tuple[int, int]:
    u, pos = uvarint_decode(buf, pos)
    return zigzag_decode(u), pos


# ---------------------------------------------------------------- bit packing
#
# LSB-first bit packing as in the Parquet RLE/bit-packed hybrid and delta
# encodings: value i occupies bits [i*w, (i+1)*w) of the output, each byte
# filled from its least-significant bit first.


def bit_width(max_value: int) -> int:
    """Number of bits needed for unsigned max_value (0 -> 0 bits)."""
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned integers (any int dtype, values < 2**width) LSB-first."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"bit width {width} > 64")
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf, width: int, n: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    nbits = n * width
    raw = np.frombuffer(buf, dtype=np.uint8, count=(nbits + 7) // 8)
    bits = np.unpackbits(raw, count=nbits, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def packed_byte_len(n: int, width: int) -> int:
    return (n * width + 7) // 8


# ---------------------------------------------------------------- misc


def max_bit_width_u64(values: np.ndarray) -> int:
    """Max bit width over an unsigned uint64 array (0 for empty/all-zero)."""
    if len(values) == 0:
        return 0
    m = int(values.max())
    return m.bit_length()
