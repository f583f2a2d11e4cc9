"""Parquet split-block Bloom filter (SBBF) — the standard sidecar any
parquet reader understands, as the reference writes it (bloom.go:99-117,
bloom/block.go:17-28: xxhash, 32-byte blocks, 8 salts).

A filter is z 32-byte blocks of 8 uint32 words. For a value's 64-bit
XXH64 hash h: block = ((h >> 32) * z) >> 32 (multiply-shift, no
power-of-two requirement); inside the block, word i gets bit
((low32(h) * SALT[i]) >> 27). Insert sets all 8 bits; check requires
all 8. Serialized as a thrift BloomFilterHeader (numBytes, SPLIT_BLOCK,
XXHASH, UNCOMPRESSED) followed by the raw little-endian bitset.
"""

from __future__ import annotations

import struct

import numpy as np

_SALT = np.array(
    [
        0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
    ],
    dtype=np.uint64,
)

BITS_PER_VALUE = 10  # ~1% fpp with 8 probes in one block
BLOCK_BYTES = 32


def xxhash64(data, offsets: np.ndarray) -> np.ndarray:
    """XXH64 (seed 0) of each [offsets[i], offsets[i+1]) byte segment;
    C kernel when a compiler exists, scalar Python fallback otherwise."""
    from . import native

    n = len(offsets) - 1
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    lib = native.load("_hash_native.c")
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    if lib is not None:
        import ctypes

        buf = bytes(data) if not isinstance(data, bytes) else data
        lib.xxhash64_segments(
            buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ctypes.c_long(n),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out
    mv = memoryview(data)
    for i in range(n):
        out[i] = _xxh64_py(bytes(mv[int(offsets[i]) : int(offsets[i + 1])]))
    return out


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 (public spec) — fallback when no C compiler."""
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc, x):
        return (rotl((acc + x * P2) & M, 31) * P1) & M

    n = len(data)
    p = 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + P1 + P2) & M, (seed + P2) & M, seed, (seed - P1) & M
        while p + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[p : p + 8], "little")); p += 8
            v2 = rnd(v2, int.from_bytes(data[p : p + 8], "little")); p += 8
            v3 = rnd(v3, int.from_bytes(data[p : p + 8], "little")); p += 8
            v4 = rnd(v4, int.from_bytes(data[p : p + 8], "little")); p += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while p + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[p : p + 8], "little")), 27) * P1 + P4) & M
        p += 8
    if p + 4 <= n:
        h = (rotl(h ^ (int.from_bytes(data[p : p + 4], "little") * P1) & M, 23) * P2 + P3) & M
        p += 4
    while p < n:
        h = (rotl(h ^ (data[p] * P5) & M, 11) * P1) & M
        p += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def num_bytes_for(ndv: int, bits_per_value: int = BITS_PER_VALUE) -> int:
    """Filter size for ndv distinct values, whole 32-byte blocks
    (filter.go:36-40 shape: size follows ndv, no power-of-two rule)."""
    raw = max(BLOCK_BYTES, (ndv * bits_per_value + 7) // 8)
    return -(-raw // BLOCK_BYTES) * BLOCK_BYTES


def _positions(hashes: np.ndarray, z: int):
    """(block_index, 8 per-word bit masks) for each hash — shared by
    insert and check."""
    h = np.asarray(hashes, dtype=np.uint64)
    block = ((h >> np.uint64(32)) * np.uint64(z)) >> np.uint64(32)
    low = h & np.uint64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        # (n, 8): bit index in each word
        bit = ((low[:, None] * _SALT[None, :]) & np.uint64(0xFFFFFFFF)) >> np.uint64(27)
    masks = (np.uint32(1) << bit.astype(np.uint32)).astype(np.uint32)
    return block.astype(np.int64), masks


class SplitBlockFilter:
    def __init__(self, num_bytes: int):
        if num_bytes % BLOCK_BYTES:
            raise ValueError("SBBF size must be a multiple of 32 bytes")
        self.words = np.zeros((num_bytes // BLOCK_BYTES, 8), dtype=np.uint32)

    @property
    def num_bytes(self) -> int:
        return self.words.size * 4

    def insert_hashes(self, hashes: np.ndarray) -> None:
        if not len(hashes):
            return
        block, masks = _positions(hashes, len(self.words))
        for w in range(8):
            np.bitwise_or.at(self.words[:, w], block, masks[:, w])

    def check_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        block, masks = _positions(hashes, len(self.words))
        got = self.words[block]  # (n, 8)
        return ((got & masks) == masks).all(axis=1)

    # ---- thrift BloomFilterHeader + bitset ----

    def serialize(self) -> bytes:
        from .parquet_wire import ts

        header = ts(
            [
                (1, "i32", self.num_bytes),
                (2, "struct", ts([(1, "struct", ts([]))])),  # SPLIT_BLOCK
                (3, "struct", ts([(1, "struct", ts([]))])),  # XXHASH
                (4, "struct", ts([(1, "struct", ts([]))])),  # UNCOMPRESSED
            ]
        )
        return header + self.words.astype("<u4").tobytes()

    @classmethod
    def deserialize(cls, buf, pos: int = 0) -> "SplitBlockFilter":
        from .parquet_wire_read import _TR

        tr = _TR(memoryview(buf), pos)
        header = tr.struct()
        num_bytes = header[1]
        bits = np.frombuffer(
            buf, dtype="<u4", count=num_bytes // 4, offset=tr.pos
        )
        f = cls.__new__(cls)
        f.words = bits.reshape(-1, 8).copy()
        return f


def build_for_values(values, physical: int) -> "SplitBlockFilter | None":
    """Filter over a null-free pyarrow array's distinct values, hashing
    each value's plain-encoded bytes (bloom.go:99-117: XXH64 of the
    PLAIN representation). Returns None for unsupported physical types."""
    import pyarrow as pa
    import pyarrow.compute as pc

    uniq = pc.unique(values)
    data, offsets = plain_segments(uniq, physical)
    if data is None:
        return None
    f = SplitBlockFilter(num_bytes_for(len(uniq)))
    f.insert_hashes(xxhash64(data, offsets))
    return f


def plain_segments(arr, physical: int):
    """(data, offsets) of each value's PLAIN encoding, for hashing.
    physical: parquet physical type id (parquet_wire.T_*)."""
    import pyarrow as pa

    from .dictionary import _byte_array_buffers
    from .parquet_wire import T_BYTE_ARRAY, T_DOUBLE, T_FLBA, T_FLOAT, T_INT32, T_INT64

    n = len(arr)
    if physical == T_BYTE_ARRAY:
        data, offsets = _byte_array_buffers(arr)
        return data, np.asarray(offsets, dtype=np.int64)
    if physical in (T_INT32, T_INT64, T_FLOAT, T_DOUBLE):
        width = 4 if physical in (T_INT32, T_FLOAT) else 8
        if physical == T_INT32:
            np_vals = arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
        elif physical == T_INT64:
            np_vals = (
                arr.view(pa.int64()) if arr.type.bit_width == 64 else arr.cast(pa.int64())
            ).to_numpy(zero_copy_only=False)
        elif physical == T_FLOAT:
            # probe values arrive as float64 (python floats): hash the
            # 4-byte float32 PLAIN encoding the filter was built from
            np_vals = arr.cast(pa.float32()).to_numpy(zero_copy_only=False)
        else:
            np_vals = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
        data = np_vals.astype(np_vals.dtype.newbyteorder("<")).tobytes()
        return data, np.arange(0, (n + 1) * width, width, dtype=np.int64)
    if physical == T_FLBA and hasattr(arr.type, "byte_width"):
        w = arr.type.byte_width
        buf = arr.buffers()[1]
        data = bytes(memoryview(buf)[arr.offset * w : (arr.offset + n) * w])
        return data, np.arange(0, (n + 1) * w, w, dtype=np.int64)
    return None, None
