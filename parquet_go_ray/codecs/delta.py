"""Delta encodings: DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY,
DELTA_BYTE_ARRAY — vectorized numpy re-implementations of the formats in
the reference's encoding/delta package (binary_packed.go:55-181,
length_byte_array.go:20-63, byte_array.go:27-215), derived from the public
Parquet spec:

DELTA_BINARY_PACKED (frame-of-reference + bit-packing; the north rule's
codec for near-monotonic timestamp columns):

    header: uvarint block_size (128) | uvarint miniblocks_per_block (4)
            | uvarint total_count | svarint first_value
    block:  svarint min_delta | miniblock bit widths (1 byte each)
            | bit-packed miniblocks (32 values each, LSB-first)

All delta arithmetic is modular in the value width (two's-complement
wraparound), so sequences touching INT64 min/max round-trip exactly —
the 64-bit-width-forcing vector from encoding_test.go:141-151 is in the
test suite.

DELTA_LENGTH_BYTE_ARRAY: value lengths as a DELTA_BINARY_PACKED int32
block, then the concatenated value bytes (Arrow string/binary layout is
exactly (offsets, data), so this is nearly zero-copy).

DELTA_BYTE_ARRAY: incremental (front) coding — shared-prefix length with
the previous value + suffix; prefix lengths and suffix lengths each
DELTA_BINARY_PACKED, suffix bytes concatenated. The prefix scan is capped
at 64 bytes like the reference's linear path (byte_array.go:11-13).
"""

from __future__ import annotations

import numpy as np

from ._util import (
    pack_bits,
    packed_byte_len,
    svarint_decode,
    svarint_encode,
    unpack_bits,
    uvarint_decode,
    uvarint_encode,
)

BLOCK_SIZE = 128
MINIBLOCKS = 4
MINIBLOCK_SIZE = BLOCK_SIZE // MINIBLOCKS  # 32

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _to_u64(values: np.ndarray, bits: int) -> np.ndarray:
    if bits == 32:
        return values.view(np.uint32).astype(np.uint64)
    return values.astype(np.int64, copy=False).view(np.uint64)


def _from_u64(values: np.ndarray, bits: int) -> np.ndarray:
    if bits == 32:
        return (values & _U64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    return values.view(np.int64)


def encode_binary_packed(values: np.ndarray, bits: int) -> bytes:
    """values: int32 (bits=32) or int64 (bits=64) ndarray."""
    n = len(values)
    header = (
        uvarint_encode(BLOCK_SIZE)
        + uvarint_encode(MINIBLOCKS)
        + uvarint_encode(n)
    )
    if n == 0:
        return header + svarint_encode(0, bits)
    u = _to_u64(values, bits)
    header += svarint_encode(int(values[0]), bits)
    if n == 1:
        return header

    mask = _MASK64 if bits == 64 else _U64(0xFFFFFFFF)
    deltas = (u[1:] - u[:-1]) & mask
    nd = len(deltas)
    nblocks = (nd + BLOCK_SIZE - 1) // BLOCK_SIZE
    pad = nblocks * BLOCK_SIZE - nd
    if pad:
        # pad with a copy of the last delta: harmless (decoder truncates)
        # and keeps the padded values inside the block's [min, max] range.
        deltas = np.concatenate((deltas, np.full(pad, deltas[-1], dtype=np.uint64)))
    # signed interpretation for per-block min:
    if bits == 32:
        signed_view = (deltas & _U64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    else:
        signed_view = deltas.view(np.int64)

    out = [header]
    blocks = deltas.reshape(nblocks, BLOCK_SIZE)
    sblocks = signed_view.reshape(nblocks, BLOCK_SIZE)
    block_mins = sblocks.min(axis=1)
    for b in range(nblocks):
        mn = int(block_mins[b])
        adjusted = (blocks[b] - _U64(mn & 0xFFFFFFFFFFFFFFFF)) & mask
        mbs = adjusted.reshape(MINIBLOCKS, MINIBLOCK_SIZE)
        widths = [
            int(m).bit_length() for m in mbs.max(axis=1)
        ]
        out.append(svarint_encode(mn, bits))
        out.append(bytes(widths))
        for i in range(MINIBLOCKS):
            if widths[i]:
                out.append(pack_bits(mbs[i], widths[i]))
    return b"".join(out)


def decode_binary_packed(buf: bytes, bits: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """Return (values ndarray int32/int64, end position)."""
    block_size, pos = uvarint_decode(buf, pos)
    miniblocks, pos = uvarint_decode(buf, pos)
    n, pos = uvarint_decode(buf, pos)
    first, pos = svarint_decode(buf, pos)
    dtype = np.int32 if bits == 32 else np.int64
    if n == 0:
        return np.empty(0, dtype=dtype), pos
    if n == 1:
        return np.array([first], dtype=dtype), pos

    mb_size = block_size // miniblocks
    mask = _MASK64 if bits == 64 else _U64(0xFFFFFFFF)
    nd = n - 1
    nblocks = (nd + block_size - 1) // block_size
    pieces = []
    for _ in range(nblocks):
        mn, pos = svarint_decode(buf, pos)
        widths = buf[pos : pos + miniblocks]
        pos += miniblocks
        block_vals = np.empty(block_size, dtype=np.uint64)
        for i in range(miniblocks):
            w = widths[i]
            if w:
                nbytes = packed_byte_len(mb_size, w)
                block_vals[i * mb_size : (i + 1) * mb_size] = unpack_bits(
                    buf[pos : pos + nbytes], w, mb_size
                )
                pos += nbytes
            else:
                block_vals[i * mb_size : (i + 1) * mb_size] = 0
        pieces.append((block_vals + _U64(mn & 0xFFFFFFFFFFFFFFFF)) & mask)
    deltas = np.concatenate(pieces)[:nd]
    acc = np.empty(n, dtype=np.uint64)
    acc[0] = np.uint64(first & 0xFFFFFFFFFFFFFFFF)
    np.cumsum(deltas, out=acc[1:])
    acc[1:] = (acc[1:] + acc[0]) & mask
    acc[0] &= mask
    return _from_u64(acc, bits), pos


# ---------------------------------------------------- DELTA_LENGTH_BYTE_ARRAY


def encode_length_byte_array(data: bytes, offsets: np.ndarray) -> bytes:
    """offsets: int32/int64 monotonically increasing, len = n+1."""
    lengths = np.diff(offsets).astype(np.int32)
    block = encode_binary_packed(lengths, 32)
    return uvarint_encode(len(block)) + block + bytes(data)


def decode_length_byte_array(buf: bytes) -> tuple[bytes, np.ndarray]:
    blen, pos = uvarint_decode(buf, 0)
    lengths, _ = decode_binary_packed(buf[pos : pos + blen], 32)
    pos += blen
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data = buf[pos : pos + int(offsets[-1])]
    return data, offsets


# -------------------------------------------------------- DELTA_BYTE_ARRAY

_PREFIX_CAP = 64


def _common_prefix_lengths(buf: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized shared-prefix length of each value with its predecessor
    (first value gets 0). Capped at _PREFIX_CAP bytes."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return out
    starts = offsets[:-1].astype(np.int64)
    lens = np.diff(offsets).astype(np.int64)
    cap = np.minimum(np.minimum(lens[:-1], lens[1:]), _PREFIX_CAP)
    # gather first _PREFIX_CAP bytes of value i and i+1, pad with distinct
    # sentinels beyond each value's length so comparison stops at min length
    k = _PREFIX_CAP
    col = np.arange(k, dtype=np.int64)
    idx_a = starts[:-1, None] + col[None, :]
    idx_b = starts[1:, None] + col[None, :]
    valid_a = col[None, :] < lens[:-1, None]
    valid_b = col[None, :] < lens[1:, None]
    total = len(buf)
    if total == 0:
        return out  # all-empty strings: every prefix length is 0
    a = buf[np.minimum(idx_a, total - 1)]
    b = buf[np.minimum(idx_b, total - 1)]
    a = np.where(valid_a, a, 256)  # sentinel 256 > any byte
    b = np.where(valid_b, b, -1)
    neq = a != b
    any_neq = neq.any(axis=1)
    first_neq = np.argmax(neq, axis=1)
    prefix = np.where(any_neq, first_neq, k)
    out[1:] = np.minimum(prefix, cap)
    return out


def encode_byte_array(data: bytes, offsets: np.ndarray) -> bytes:
    buf = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    prefix = _common_prefix_lengths(buf, offsets)
    suffix_lens = (lens - prefix).astype(np.int32)
    # gather suffix bytes: for value i, bytes [start+prefix, start+len)
    starts = offsets[:-1] + prefix
    raw = np.frombuffer(data, dtype=np.uint8)
    if n and int(suffix_lens.sum()):
        seg_starts = np.repeat(starts, suffix_lens)
        within = np.arange(int(suffix_lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(suffix_lens) - suffix_lens, suffix_lens
        )
        suffix_bytes = raw[seg_starts + within].tobytes()
    else:
        suffix_bytes = b""
    pblock = encode_binary_packed(prefix.astype(np.int32), 32)
    sblock = encode_binary_packed(suffix_lens, 32)
    return (
        uvarint_encode(len(pblock))
        + pblock
        + uvarint_encode(len(sblock))
        + sblock
        + suffix_bytes
    )


def decode_byte_array(buf: bytes) -> tuple[bytes, np.ndarray]:
    blen, pos = uvarint_decode(buf, 0)
    prefix, _ = decode_binary_packed(buf[pos : pos + blen], 32)
    pos += blen
    blen, p2 = uvarint_decode(buf, pos)
    suffix_lens, _ = decode_binary_packed(buf[p2 : p2 + blen], 32)
    pos = p2 + blen
    n = len(prefix)
    lens = prefix.astype(np.int64) + suffix_lens.astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    out = bytearray(int(offsets[-1]))
    mv = memoryview(out)
    suffixes = memoryview(bytes(buf[pos:]))
    spos = 0
    prev_start = 0
    for i in range(n):
        start = int(offsets[i])
        p = int(prefix[i])
        sl = int(suffix_lens[i])
        if p:
            mv[start : start + p] = mv[prev_start : prev_start + p]
        if sl:
            mv[start + p : start + p + sl] = suffixes[spos : spos + sl]
            spos += sl
        prev_start = start
    return bytes(out), offsets
