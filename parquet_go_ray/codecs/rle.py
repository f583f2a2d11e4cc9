"""RLE / bit-packed hybrid encoding (Parquet-style), vectorized in numpy.

Semantics follow the hybrid format implemented by the reference at
/root/reference/encoding/rle/rle.go:31-554 (uvarint run headers: even =
RLE run of `header>>1` repeated values, odd = `header>>1` groups of 8
bit-packed values), re-derived from the public Parquet spec. Encoder run
decisions need not match the reference byte-for-byte; round-trip equality
is the contract (the reference's own fuzz harness takes the same stance,
encoding/fuzz/fuzz.go:128-158).

Layout produced by :func:`encode`:

    [uvarint header][payload] ...  repeated until all values are covered

- RLE run: header = count << 1; payload = value in ceil(width/8) LE bytes.
- Bit-packed run: header = (groups << 1) | 1; payload = groups*8 values
  bit-packed LSB-first (`groups*width` bytes). Zero padding values are
  allowed only in the final run (decoder truncates to `n`).

The value-level codec (`encode_ints` / `decode_ints`) adds a small
frame-of-reference header (zigzag min + bit width) so arbitrary signed
int32/int64 columns can be RLE-coded: values are encoded as
(v - min) mod 2**64.
"""

from __future__ import annotations

import numpy as np

from ._util import (
    bit_width,
    pack_bits,
    packed_byte_len,
    svarint_decode,
    svarint_encode,
    unpack_bits,
    uvarint_decode,
    uvarint_encode,
)

_MIN_RLE_RUN = 8  # shortest run worth an RLE header (one bit-pack group)


def _runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (run_starts, run_lengths) for equal-value runs."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.nonzero(values[1:] != values[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    return starts, lengths


def encode(values: np.ndarray, width: int) -> bytes:
    """Encode unsigned values (< 2**width) with the RLE/bit-packed hybrid."""
    n = len(values)
    if n == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    value_bytes = max(1, (width + 7) // 8)

    starts, lengths = _runs(v)
    long_mask = lengths >= _MIN_RLE_RUN
    covered = int(lengths[long_mask].sum())

    out = []

    def emit_rle(value: int, count: int) -> None:
        out.append(uvarint_encode(count << 1))
        out.append(int(value).to_bytes(value_bytes, "little"))

    def emit_packed(seg: np.ndarray) -> None:
        # pad to a multiple of 8 (only legal as the final run; callers ensure
        # mid-stream segments are already multiples of 8)
        groups = (len(seg) + 7) // 8
        pad = groups * 8 - len(seg)
        if pad:
            seg = np.concatenate((seg, np.zeros(pad, dtype=np.uint64)))
        out.append(uvarint_encode((groups << 1) | 1))
        out.append(pack_bits(seg, width))

    if covered * 2 < n or width == 0:
        # few long runs -> a single bit-packed stream is at least as small
        # (and avoids a Python loop over ~n runs). width==0 degenerates to a
        # single RLE run of the only possible value, 0.
        if width == 0:
            emit_rle(0, n)
        else:
            emit_packed(v)
        return b"".join(out)

    # Walk long runs; everything between them is bit-packed. Mid-stream
    # bit-packed segments must cover a multiple of 8 values, so borrow the
    # head of the following long run when needed (it stays >= 0 long).
    pos = 0
    long_idx = np.nonzero(long_mask)[0]
    for i in long_idx:
        s, ln = int(starts[i]), int(lengths[i])
        if s > pos:
            gap = s - pos
            borrow = (8 - gap % 8) % 8
            if borrow and borrow < ln:
                emit_packed(v[pos : s + borrow])
                s += borrow
                ln -= borrow
            elif borrow:
                # run too short to both pad the gap and survive; fold it in
                emit_packed(v[pos : s + ln])
                pos = s + ln
                continue
            else:
                emit_packed(v[pos:s])
        if ln:
            emit_rle(int(v[s]), ln)
        pos = s + ln
    if pos < n:
        emit_packed(v[pos:])
    return b"".join(out)


def decode(buf: bytes, width: int, n: int) -> np.ndarray:
    """Decode n values -> uint64 array."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    value_bytes = max(1, (width + 7) // 8)
    pieces = []
    got = 0
    pos = 0
    while got < n:
        header, pos = uvarint_decode(buf, pos)
        if header & 1:
            groups = header >> 1
            count = groups * 8
            nbytes = packed_byte_len(count, width)
            vals = unpack_bits(buf[pos : pos + nbytes], width, count)
            pos += nbytes
        else:
            count = header >> 1
            value = int.from_bytes(buf[pos : pos + value_bytes], "little")
            pos += value_bytes
            vals = np.full(count, value, dtype=np.uint64)
        pieces.append(vals)
        got += count
    result = pieces[0] if len(pieces) == 1 else np.concatenate(pieces)
    return result[:n]


# ------------------------------------------------------------ value codec


def encode_ints(values: np.ndarray, bits: int) -> bytes:
    """Frame-of-reference + RLE hybrid for signed int32/int64 columns.

    Layout: [svarint min][u8 width][uvarint n][hybrid stream].
    """
    n = len(values)
    if n == 0:
        return svarint_encode(0) + bytes([0]) + uvarint_encode(0)
    u = values.astype(np.int64, copy=False).view(np.uint64)
    lo = int(values.min())
    shifted = (u - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    if bits < 64:
        shifted &= np.uint64((1 << bits) - 1)
    width = bit_width(int(shifted.max()))
    return (
        svarint_encode(lo)
        + bytes([width])
        + uvarint_encode(n)
        + encode(shifted, width)
    )


def decode_ints(buf: bytes, bits: int) -> np.ndarray:
    lo, pos = svarint_decode(buf, 0)
    width = buf[pos]
    pos += 1
    n, pos = uvarint_decode(buf, pos)
    shifted = decode(buf[pos:], width, n)
    vals = (shifted + np.uint64(lo & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    if bits == 32:
        return (vals & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return vals


# ------------------------------------------------------------ booleans/levels


def encode_booleans(values: np.ndarray) -> bytes:
    """Booleans -> width-1 hybrid stream prefixed with uvarint count."""
    v = values.astype(np.uint64, copy=False)
    return uvarint_encode(len(v)) + encode(v, 1)


def decode_booleans(buf: bytes) -> np.ndarray:
    n, pos = uvarint_decode(buf, 0)
    return decode(buf[pos:], 1, n).astype(bool)


def encode_levels(levels: np.ndarray, width: int) -> bytes:
    """Repetition/definition-level style stream (width fixed by caller)."""
    return uvarint_encode(len(levels)) + encode(levels, width)


def decode_levels(buf: bytes, width: int) -> np.ndarray:
    n, pos = uvarint_decode(buf, 0)
    return decode(buf[pos:], width, n).astype(np.uint8)
